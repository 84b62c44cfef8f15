package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Data Selection via Importance Resampling (DSIR): score every raw
  * document by how much its hashed-n-gram distribution looks like a
  * TARGET corpus rather than the raw corpus, then draw a fixed-size
  * subset with Gumbel-top-k on the importance weights — the published
  * recipe (Xie et al. 2023, "Data Selection for Language Models via
  * Importance Resampling") for tilting a web-scale crawl toward a
  * high-quality / in-domain slice without training a classifier.
  *
  * The feature space is `buckets` hashed unigram cells (bag of
  * hashed n-grams). Both corpus distributions are Laplace-smoothed
  * multinomials over the cells; a document's log importance weight is
  *
  *   w(d) = Σ_{tok ∈ d} [ ln p̂_target(b(tok)) − ln p̂_raw(b(tok)) ]
  *
  * with b(tok) = the token's md5 cell, p̂(b) = (c_b + α)/(N + αB).
  *
  * Scale shape: the two distribution fits are ONE shared pass over
  * the exploded token stream (a map-side-combined hash aggregation to
  * ≤ B cells — bounded output whatever the corpus size); the
  * per-document scoring joins each token against the BROADCAST
  * B-row log-ratio table and sums per document (one shuffle on
  * doc_id, partially aggregated map-side). Selection is
  * Gumbel-top-k: a deterministic md5-seeded Gumbel per doc added to
  * w(d)/temperature, then TakeOrderedAndProject — per-partition heaps
  * of k rows, never a global sort. Nothing driver-side, nothing
  * corpus-sized in memory: this is exactly the plan you want when
  * "raw" is 100 TB and "target" is a curated sliver.
  *
  * Cross-engine determinism: cells come from md5 hex (identical in
  * DuckDB), counts are exact integers so every ln() argument is the
  * same rational in both engines, and the final float sums carry an
  * in-query round(…, 6) that absorbs accumulation-order noise (the
  * bigramLmScore convention).
  */
object Dsir {

  /** Hashed feature cell in [0, buckets): first 4 hex digits of the
    * token's md5 (uniform 16-bit draw), mod the cell count.
    */
  def bucketOf(tok: Column, buckets: Int): Column = {
    require(buckets > 0 && buckets <= 65536,
      s"buckets must be in [1, 65536] (the hash draws 16 bits), got $buckets")
    conv(substring(md5(tok), 1, 4), 16, 10).cast("int") % buckets
  }

  /** Per-document DSIR log importance weight of every document in
    * `raw`, with the target corpus defined in-plan as the rows
    * matching `targetPred` (e.g. a language or quality gate).
    *
    * @param ngram feature order: 1 = hashed unigrams; 2 = hashed word
    *   BIGRAMS — the paper's actual feature space (bigrams see phrase
    *   structure unigram bags cannot). Features stay row-local either
    *   way (adjacent-pair zip, no window).
    * @return (idCol, n_tokens BIGINT, dsir_weight DOUBLE — rounded 1e-6)
    */
  def importanceWeights(raw: DataFrame, targetPred: Column, buckets: Int,
                        alpha: Double = 1.0, idCol: String = "doc_id",
                        textCol: String = "text", ngram: Int = 1): DataFrame = {
    require(alpha > 0.0, s"alpha must be positive, got $alpha")
    require(ngram == 1 || ngram == 2, s"ngram must be 1 or 2, got $ngram")
    val words = split(TextOps.normalize(col(textCol)), " ")
    val features =
      if (ngram == 1) words
      else {
        // row-local adjacent pairs (the bigramsOf discipline): zip the
        // words array against its own 1-shifted slice
        val nPairs = greatest(size(words) - 1, lit(0))
        zip_with(slice(words, lit(1), nPairs), slice(words, lit(2), nPairs),
          (a, b) => concat_ws(" ", a, b))
      }
    // the predicate is evaluated scan-side BEFORE the explode — the
    // target flag rides along with each token instead of re-joining
    // the corpus-sized token stream back onto the documents
    val toks = raw.select(col(idCol), targetPred.as("__is_target"),
        explode(features).as("tok"))
      .withColumn("bucket", bucketOf(col("tok"), buckets))
    // ONE pass fits both multinomials: raw counts every token, target
    // counts the subset passing the predicate. Output ≤ B cells.
    val cells = toks
      .groupBy("bucket")
      .agg(count(lit(1)).as("__rc"),
        count(when(col("__is_target"), 1)).as("__tc"))
    // Totals as a window over the ≤ B cell rows keeps the plan LINEAR —
    // a separate .agg() branch would re-derive the cell aggregation
    // (and its corpus tokenization pass) on a second subtree. The
    // window's single partition is B-bounded by construction
    // (constant-but-unfoldable key, the StarQueries pattern).
    val totW = org.apache.spark.sql.expressions.Window
      .partitionBy(graft.plans.PlanLint.kBoundedKey(col("bucket")))
    val b = buckets.toDouble
    val logRatio = cells
      // both totals in ONE select → a single Window node (chained
      // withColumns planned as two windows with an exchange between)
      .select(col("bucket"), col("__rc"), col("__tc"),
        sum("__rc").over(totW).as("__R"), sum("__tc").over(totW).as("__T"))
      .select(col("bucket"),
        (log((col("__tc") + alpha) / (col("__T") + alpha * b)) -
          log((col("__rc") + alpha) / (col("__R") + alpha * b))).as("__lr"))
    toks.join(broadcast(logRatio), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        round(sum(col("__lr")), 6).as("dsir_weight"))
  }

  /** Gumbel-top-k importance resampling: draw the `k` documents with
    * the largest `w(d)/temperature + Gumbel(doc)` — an exact sample
    * (without replacement) from the softmax of the importance weights,
    * reproducible because the Gumbel comes from an md5-seeded uniform
    * keyed (doc, salt). `temperature → 0⁺` degenerates to hard top-k
    * by weight; the paper's sampled variant keeps corpus diversity.
    *
    * @return (idCol, n_tokens, dsir_weight, gumbel_score DOUBLE, rank INT)
    */
  def resample(raw: DataFrame, targetPred: Column, k: Int, buckets: Int,
               alpha: Double = 1.0, temperature: Double = 1.0,
               salt: String = "dsir", idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(temperature > 0.0, s"temperature must be positive, got $temperature")
    val w = importanceWeights(raw, targetPred, buckets, alpha, idCol, textCol)
    // uniform in (0,1): first 8 md5 hex digits (+½) / 2³² — the
    // Imputer.scala seeded-draw convention, exact in both engines
    val u = (conv(substring(md5(concat(col(idCol).cast("string"),
      lit(":" + salt))), 1, 8), 16, 10).cast("double") + 0.5) / 4294967296.0
    val scored = w.withColumn("gumbel_score",
      round(col("dsir_weight") / temperature - log(-log(u)), 6))
    // TakeOrderedAndProject (per-partition k-heaps), then a k-bounded
    // rank window over a constant-but-unfoldable partition key (the
    // StarQueries pattern — no data-dependent single-partition window).
    // The key hashes the id first: pmod on the raw column would cast a
    // string id to double (null for non-numeric ids), splitting mixed
    // id formats into two window partitions with duplicate ranks.
    scored.orderBy(col("gumbel_score").desc, col(idCol)).limit(k)
      .withColumn("rank", row_number().over(
        Window.partitionBy(graft.plans.PlanLint.kBoundedKey(col(idCol)))
          .orderBy(col("gumbel_score").desc, col(idCol))).cast("int"))
  }
}
