package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tokenizer-evaluation statistics: per-language fertility (subword
  * tokens per whitespace word) and chars-per-token — the standard
  * audit of how well a tokenizer serves each language in a
  * multilingual mix (high fertility = the language pays more sequence
  * positions per word; compare against the corpus mix before fixing
  * sampling temperatures).
  *
  * ONE map-side-combinable aggregate keyed by language (output =
  * languages rows); all ratios derive from exact long sums.
  */
object TokenizerStats {
  import graft.text.TextOps

  /** @return (lang, n_docs, n_words, n_subwords, fertility,
    *   chars_per_subword) — ratios rounded 1e-6
    */
  def fertility(docs: DataFrame, langCol: String = "lang",
                textCol: String = "text"): DataFrame =
    docs.groupBy(col(langCol).as("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextOps.tokenCount(col(textCol)).cast("long")).as("n_words"),
        sum(TextOps.tokenCountBpe(col(textCol)).cast("long")).as("n_subwords"),
        sum(length(col(textCol)).cast("long")).as("n_chars_sum"))
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_subwords"),
        round(col("n_subwords").cast("double") / col("n_words"), 6)
          .as("fertility"),
        round(col("n_chars_sum").cast("double") / col("n_subwords"), 6)
          .as("chars_per_subword"))
}

/** Collocation (phrase) mining — pointwise mutual information over
  * adjacent token pairs, the statistic behind word2vec-style phrase
  * merging ("new york" → "new_york") and collocation-aware tokenizer
  * prep:
  *
  *   pmi(a,b) = ln( P(a,b) / (P(a)·P(b)) )
  *            = ln( N₂(a,b) · T² / (B · N₁(a) · N₁(b)) )
  *
  * with N₁/T unigram counts/total and N₂/B bigram counts/total.
  *
  * Scale shape: bigram construction is ROW-LOCAL (zip the word array
  * with its own tail — no window, no per-doc shuffle); unigram and
  * bigram counts are map-side-combinable hash aggregates keyed by
  * token/pair; the corpus totals are a 1-row broadcast; the final
  * scoring joins the pair table to the vocabulary-keyed unigram
  * counts. Everything stays content-keyed — the Zipf head combines
  * map-side, and no stage is quadratic.
  *
  * Determinism: every count is an exact long; the single `ln` runs on
  * an identical rational on both engines, so 1e-6 output rounding is
  * orders of magnitude above the ULP noise.
  */
object Collocations {

  /** PMI-scored adjacent pairs with `pairCount >= minCount`.
    * Output: (tok_a, tok_b, pair_count, pmi)
    */
  def pmiPairs(docs: DataFrame, minCount: Long = 5L,
               textCol: String = "text"): DataFrame = {
    require(minCount >= 1L, s"minCount must be >= 1, got $minCount")
    val words = split(TextOps.normalize(col(textCol)), " ")
    val withWords = docs.select(words.as("ws"))
      .filter(size(col("ws")) >= 2)
    // row-local bigrams: zip ws[0..n-2] with ws[1..n-1]
    val bigrams = withWords.select(explode(
      zip_with(slice(col("ws"), lit(1), size(col("ws")) - 1),
        slice(col("ws"), lit(2), size(col("ws")) - 1),
        (a, b) => struct(a.as("tok_a"), b.as("tok_b")))).as("bg"))
      .select(col("bg.tok_a"), col("bg.tok_b"))
    val uni = docs.select(explode(split(TextOps.normalize(col(textCol)), " "))
        .as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n1"))
    val totals = uni.agg(sum("n1").as("t_uni"))
    val pairCounts = bigrams.groupBy("tok_a", "tok_b")
      .agg(count(lit(1)).as("pair_count"))
      .filter(col("pair_count") >= minCount)
    val bTotal = bigrams.agg(count(lit(1)).as("t_bi"))
    // unigram joins stay token-keyed (the bm25 discipline) — the
    // vocabulary is NOT broadcast-safe at corpus scale; only the
    // 1-row totals broadcast
    pairCounts
      .join(uni.select(col("tok").as("tok_a"), col("n1").as("na")), "tok_a")
      .join(uni.select(col("tok").as("tok_b"), col("n1").as("nb")), "tok_b")
      .crossJoin(broadcast(totals)).crossJoin(broadcast(bTotal))
      .select(col("tok_a"), col("tok_b"), col("pair_count"),
        round(log(col("pair_count").cast("double") * col("t_uni") * col("t_uni")
          / (col("t_bi").cast("double") * col("na") * col("nb"))), 6).as("pmi"))
  }
}
