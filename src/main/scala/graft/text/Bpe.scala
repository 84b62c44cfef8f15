package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Greedy longest-match subword tokenization against an explicit,
  * bounded vocabulary — tokenizer-REAL token budgets for chunking and
  * packing (the WordPiece/BPE-inference matching rule: at each
  * position consume the longest vocabulary entry that prefixes the
  * remaining word; no match consumes one character as its own
  * token). Replaces the regex token-count proxy wherever budgets
  * must be trustworthy for an actual pretraining loader.
  *
  * Everything is deterministic and engine-portable: the vocabulary
  * is an ordered list of strings, matching is pure string
  * comparison, and the whole tokenizer is native codegen'd Column
  * expressions (`aggregate`/`transform` higher-order functions over
  * a per-word character fold) — no UDF, no driver round-trip per
  * row, so it runs at scan parallelism on any corpus size. The
  * DuckDB oracle re-derives the identical matching rule as a
  * recursive CTE with a correlated longest-match subquery.
  *
  * Scale shape: the vocabulary is BOUNDED (top-N corpus words, or a
  * fixed tokenizer vocab shipped as a file) and travels as a literal
  * map inside the expression tree — the per-task equivalent of a
  * broadcast; the fold does O(word length) map probes per word, all
  * inside whole-stage codegen.
  */
object Bpe {

  /** Deterministic corpus-derived vocabulary: the top-`size`
    * normalised tokens by global frequency, ties lexicographic (the
    * same derivation oovRate uses — one map-side-combined count
    * aggregation; the sort is over the counted VOCABULARY, not the
    * token stream). A real deployment would load its tokenizer's
    * vocab file instead; the derivation keeps the harness
    * self-contained and the oracle reproducible.
    */
  def corpusVocab(docs: DataFrame, size: Int,
                  textCol: String = "text"): Seq[String] =
    docs.select(explode(split(TextOps.normalize(col(textCol)), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("tok"))
      .limit(size)
      .select("tok").collect().map(_.getString(0)).toSeq

  /** Tokenize ONE word: array of subword tokens under greedy
    * longest-match. Unmatched positions emit their single character,
    * so `concat(tokens) == word` always (lossless round-trip — the
    * property the spec pins).
    */
  def tokenizeWord(word: Column, vocab: Seq[String]): Column = {
    require(vocab.nonEmpty, "empty vocabulary")
    // one literal map PER ENTRY LENGTH: the match test for length l
    // probes only the entries of that length (map lookup on a literal
    // map is a scan, so one combined map would compare every entry at
    // every branch — measured ~2× slower at sf0.1); lengths absent
    // from the vocab generate no branch at all
    val byLen = vocab.groupBy(_.length).toSeq.sortBy(-_._1)
    // state: (pos — 1-based cursor, toks — emitted tokens). One fold
    // step per character bounds the iteration; steps after the cursor
    // passes the end are no-ops.
    val fold = aggregate(
      sequence(lit(1), length(word)),
      struct(lit(1).as("pos"), array().cast("array<string>").as("toks")),
      (st, _) => {
        val pos = st.getField("pos")
        val remaining = length(word) - pos + 1
        // longest l with word[pos, l] in vocab, else 1 (unk char)
        val m = coalesce(
          byLen.map { case (l, entries) =>
            val lookup = map(entries.flatMap(v => Seq(lit(v), lit(1))): _*)
            when(remaining >= l &&
              element_at(lookup, word.substr(pos, lit(l))).isNotNull,
              lit(l))
          } :+ lit(1): _*)
        when(pos > length(word), st).otherwise(
          struct((pos + m).as("pos"),
            concat(st.getField("toks"),
              array(word.substr(pos, m))).as("toks")))
      },
      st => st.getField("toks"))
    when(length(word) === 0, array().cast("array<string>")).otherwise(fold)
  }

  /** Token cost of one word (greedy longest-match count; '' costs 0). */
  def wordCost(word: Column, vocab: Seq[String]): Column =
    size(tokenizeWord(word, vocab)).cast("long")

  /** Subword tokens of a whole text (normalised, word-split, each
    * word tokenized, flattened).
    */
  def tokenize(text: Column, vocab: Seq[String]): Column =
    flatten(transform(split(TextOps.normalize(text), " "),
      w => tokenizeWord(w, vocab)))

  /** BPE token count of a whole text — the budget denominator. */
  def tokenCount(text: Column, vocab: Seq[String]): Column =
    aggregate(
      transform(split(TextOps.normalize(text), " "),
        w => wordCost(w, vocab)),
      lit(0L), (acc, c) => acc + c)

  /** BPE-budget document chunking — the tokenizer-real twin of
    * [[TextOps.chunkDocuments]]: words pack greedily into chunks of
    * at most `budget` BPE tokens, never splitting a word; a word
    * costing more than the whole budget gets a chunk of its own.
    * Unlike the fixed-step whitespace chunker, boundaries here depend
    * on the running token cost, so the assembly is a sequential fold
    * — but a ROW-LOCAL one: chunks accumulate inside one
    * `aggregate` over the word array (state: filled budget + the
    * chunk texts/costs built so far), then explode. No window, no
    * shuffle — scan-stage parallelism at any corpus size, the same
    * discipline as the whitespace chunker.
    *
    * @return (idCol, chunk_id INT, chunk_text, n_tokens_bpe BIGINT)
    */
  def chunkByBudget(docs: DataFrame, budget: Int, vocab: Seq[String],
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    require(budget > 0, "budget must be positive")
    val words = split(TextOps.normalize(col(textCol)), " ")
    // state: texts[i], costs[i] per chunk so far; filled = cost of the
    // open (last) chunk. Appending to the open chunk rewrites the
    // array tail — arrays are small (chunks per doc), and everything
    // stays codegen'd.
    val fold = aggregate(
      words,
      struct(
        array().cast("array<string>").as("texts"),
        array().cast("array<bigint>").as("costs")),
      (st, w) => {
        val texts = st.getField("texts")
        val costs = st.getField("costs")
        val c = wordCost(w, vocab)
        val n = size(texts)
        val open = element_at(costs, -1)
        val fits = n > 0 && open + c <= lit(budget.toLong)
        val appended = struct(
          concat(slice(texts, lit(1), n - 1),
            array(concat_ws(" ", element_at(texts, -1), w))).as("texts"),
          concat(slice(costs, lit(1), n - 1),
            array(open + c)).as("costs"))
        val opened = struct(
          concat(texts, array(w)).as("texts"),
          concat(costs, array(c)).as("costs"))
        when(fits, appended).otherwise(opened)
      },
      st => st)
    docs
      .select(col(idCol), fold.as("__f"))
      .select(col(idCol), col("__f.costs").as("__costs"),
        posexplode(col("__f.texts")))
      .select(col(idCol), col("pos").cast("int").as("chunk_id"),
        col("col").as("chunk_text"),
        element_at(col("__costs"), col("pos") + 1).as("n_tokens_bpe"))
  }

  // ----- BPE TRAINING (merge learning), Sennrich et al. 2016 ---------

  /** The deduplicated word-frequency table the trainer iterates on:
    * (syms: array<string> — one char per element, freq). At 100 TB the
    * corpus aggregates ONCE down to its word vocabulary (millions of
    * rows, not billions) and every merge iteration runs on that small
    * table — the standard trick that makes BPE training tractable at
    * corpus scale.
    */
  def wordFreqs(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(split(TextOps.normalize(col(textCol)), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(split(col("w"), "").as("syms"), col("freq"))

  /** Adjacent symbol pairs of one word, each tagged with the word's
    * frequency (overlapping positions both count, as in the reference
    * algorithm's get_stats).
    */
  private def adjacentPairs(syms: Column): Column =
    when(size(syms) < 2, array().cast("array<struct<a:string,b:string>>"))
      .otherwise(zip_with(
        slice(syms, lit(1), size(syms) - 1),
        slice(syms, lit(2), size(syms) - 1),
        (a, b) => struct(a.as("a"), b.as("b"))))

  /** Merge every left-to-right non-overlapping occurrence of the
    * adjacent pair (a, b) into one symbol a+b — a pure codegen'd fold,
    * no UDF.
    */
  def mergePair(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) => when(
        size(acc) > 0 && element_at(acc, -1) === lit(a) && s === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))

  /** Top-`k` adjacent character pairs by frequency-weighted count —
    * the first iteration of BPE training, exposed separately because
    * it IS oracle-expressible in plain SQL (the full loop's argmax →
    * re-merge recursion is not).
    */
  def pairStats(docs: DataFrame, k: Int, textCol: String = "text"): DataFrame =
    wordFreqs(docs, textCol)
      .select(col("freq"), explode(adjacentPairs(col("syms"))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))
      .orderBy(col("cnt").desc, col("a"), col("b"))
      .limit(k)

  /** Learn `nMerges` BPE merge rules from the corpus (the public
    * algorithm of Sennrich, Haddow & Birch 2016): start from
    * characters, repeatedly merge the globally most frequent adjacent
    * symbol pair (ties broken lexicographically, so training is
    * deterministic).
    *
    * Scale shape: one corpus-wide aggregation builds [[wordFreqs]];
    * each of the nMerges iterations is then a pair-count aggregation
    * over that word table plus ONE collected row (the argmax pair —
    * a bounded, single-row collect by construction) and a codegen'd
    * re-merge projection. `localCheckpoint` keeps the iterated plan
    * flat instead of nMerges folds deep.
    *
    * @return (rank, left, right, merged, pair_freq) per learned rule,
    *   in training order.
    */
  def trainMerges(docs: DataFrame, nMerges: Int,
                  textCol: String = "text"): Seq[(Int, String, String, String, Long)] = {
    require(nMerges > 0, "nMerges must be positive")
    var words = wordFreqs(docs, textCol).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var exhausted = false
    while (merges.size < nMerges && !exhausted) {
      val top = words
        .select(col("freq"), explode(adjacentPairs(col("syms"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((merges.size + 1, a, b, a + b, cnt))
        words = words
          .select(mergePair(col("syms"), a, b).as("syms"), col("freq"))
          .localCheckpoint()
      }
    }
    merges.toSeq
  }

  /** [[trainMerges]] as a DataFrame, for the query surface. */
  def trainMergesDF(docs: DataFrame, nMerges: Int,
                    textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    spark.createDataFrame(trainMerges(docs, nMerges, textCol))
      .toDF("rank", "left", "right", "merged", "pair_freq")
  }

  /** Segment one word by applying learned merges in training order —
    * the BPE-inference counterpart of [[trainMerges]] (rule-order
    * application, distinct from the longest-match [[tokenizeWord]]).
    */
  def applyMerges(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(split(word, "")) { case (syms, (a, b)) =>
      mergePair(syms, a, b)
    }
}
