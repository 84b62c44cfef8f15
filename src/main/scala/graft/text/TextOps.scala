package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language identification, document
  * fingerprinting. All pure Column expressions (whole-stage codegen, no
  * UDFs) so they run at scan speed over 100 TB of documents.
  *
  * These extend the reference's purely numeric surface (SURVEY §2.2
  * notes it has no string functions) with the operations a pretraining
  * corpus pipeline needs.
  */
object TextOps {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish token count: alphabetic runs, digit runs, and single
    * punctuation marks each count as one token (a cheap proxy for
    * subword tokenizers when budgeting corpus sizes).
    */
  def tokenCountBpe(text: Column): Column =
    regexp_count(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"))

  /** Normalised text: lowercased, whitespace collapsed, trimmed. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** md5 fingerprint of the normalised text — the exact-dedup key. */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Heuristic quality score in [0, 1]:
    *  0.4 · length component (saturating at 200 tokens)
    *  0.3 · (1 − punctuation ratio)
    *  0.3 · stopword presence (saturating at 10 hits)
    * Deterministic and cheap — the shape of C4/Gopher-style quality
    * filters, not a trained model.
    */
  def qualityScore(text: Column): Column = {
    val toks = tokenCount(text).cast("double")
    val punct = (length(text) - length(regexp_replace(text, "[.,!?;:]", "")))
      .cast("double")
    val punctRatio = punct / greatest(length(text).cast("double"), lit(1.0))
    val stop = stopwordHits(text, Seq("the", "a", "and", "of", "is")).cast("double")
    least(toks / 200.0, lit(1.0)) * 0.4 +
      (lit(1.0) - punctRatio) * 0.3 +
      least(stop / 10.0, lit(1.0)) * 0.3
  }

  /** Number of occurrences of any of `words` as whitespace-delimited
    * tokens, counted via literal replace over DOUBLED delimiters: after
    * `replace(nt, " ", "  ")` every token carries its own surrounding
    * spaces, so consecutive occurrences no longer overlap and the
    * non-overlapping scan counts them exactly (a single-spaced padded
    * replace undercounts runs). Each removed " w " (w+2 chars → 1)
    * shortens the string by len(w)+1. Literal string replace — no
    * regex, no per-row array allocation, identical in any SQL dialect.
    */
  def stopwordHits(text: Column, words: Seq[String]): Column = {
    val padded = concat(lit(" "),
      call_function("replace", normalize(text), lit(" "), lit("  ")), lit(" "))
    words.map { w =>
      require(w.matches("[a-z0-9]+"), s"stopword must be plain alphanumeric: $w")
      (length(padded) -
        length(call_function("replace", padded, lit(s" $w "), lit(" ")))) / (w.length + 1)
    }.reduce(_ + _)
  }

  /** Language-ID scores: hits of per-language stopword lists. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of"),
    "de" -> Seq("der", "die", "und"),
    "fr" -> Seq("le", "la", "et"),
    "es" -> Seq("el", "los", "y"),
  )

  /** Predicted language: argmax of marker-stopword hits with a fixed
    * tie-break order (en > de > fr > es > unknown). An n-gram/stopword
    * heuristic, not a model — deterministic and oracle-checkable.
    */
  def langId(text: Column): Column = {
    val scores = LangMarkers.map { case (lang, ws) => lang -> stopwordHits(text, ws) }
    val best = scores.map(_._2).reduce(greatest(_, _))
    val firstBest = scores.foldRight(lit("unknown")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lang).otherwise(acc)
    }
    firstBest
  }

  /** Standard quality/shape columns for a documents table. */
  def analyze(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("n_tokens", tokenCount(t))
      .withColumn("n_tokens_bpe", tokenCountBpe(t))
      .withColumn("fingerprint", fingerprint(t))
      .withColumn("quality", qualityScore(t))
      .withColumn("lang_pred", langId(t))
  }

  /** The composed corpus-preparation pipeline: exact-dedup (keep the
    * canonical doc per fingerprint), quality floor, language filter —
    * one declarative plan over the raw documents.
    */
  def corpusFilter(docs: DataFrame, minQuality: Double, lang: String,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // Stage 1 — dedup on the cheap fingerprint alone (one normalise +
    // md5 per doc): canonical id per group via hash aggregation
    // (skew-safe: map-side partial combine, no per-group sort — see
    // Dedup.exact). A doc survives iff its id IS a canonical id —
    // each doc belongs to exactly one fingerprint group, so the
    // semi-join on id implements keep-the-canonical exactly.
    val canon = docs
      .select(fingerprint(col(textCol)).as("fingerprint"), col(idCol))
      .groupBy(col("fingerprint"))
      .agg(min(col(idCol)).as(idCol))
    val kept = docs.join(canon.select(col(idCol)), Seq(idCol), "left_semi")
    // Stage 2 — the expensive quality/language analysis runs only on
    // the deduplicated survivors, and must be evaluated exactly ONCE
    // per row: pushed into a Filter below the projection, the wide
    // quality/lang trees lose Project-side subexpression elimination
    // (FilterExec doesn't CSE — predicates short-circuit), so every
    // shared replace()/normalize() re-evaluates per conjunct, ~3-4x
    // the scan cost. The leading nondeterministic always-true conjunct
    // pins the whole predicate above the Project: Catalyst pushes only
    // the leading deterministic prefix of a conjunction
    // (PushPredicateThroughNonJoin preserves evaluation order), and a
    // nondeterministic HEAD makes that prefix empty. (A barrier
    // *column* does not survive: ColumnPruning drops it as unused and
    // the filter pushes anyway.)
    analyze(kept, textCol)
      .filter(monotonically_increasing_id() >= 0 &&
        col("quality") >= minQuality && col("lang_pred") === lang)
      .select(col(idCol), col("n_tokens").cast("long").as("n_tokens"),
        col("quality"), col("lang_pred"))
  }

  /** Corpus budgeting: token totals per predicted language. */
  def corpusStats(docs: DataFrame, textCol: String = "text"): DataFrame =
    analyze(docs, textCol)
      .groupBy(col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("total_tokens"),
        avg(col("n_tokens").cast("double")).as("avg_tokens"))
}
