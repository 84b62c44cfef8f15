package graft.text

import graft.dedup.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination and boilerplate detection — the two
  * n-gram-overlap filters every pretraining corpus pass runs:
  * drop/flag training documents that leak evaluation data, and score
  * documents by how much corpus-common boilerplate they carry.
  *
  * Both reuse the dedup word-shingle machinery (`Dedup.shingles`:
  * distinct word n-grams per document, null-padded tail semantics).
  */
object Contamination {

  /** Flag training documents sharing any word-`n`-gram with the eval
    * set — n-gram decontamination as used for held-out benchmark
    * hygiene.
    *
    * Scale shape: the EVAL side is the benchmark suite — tiny by
    * construction — so its distinct shingle set is broadcast and the
    * training corpus streams through one broadcast-hash semi-ish join
    * + per-doc count; no shuffle of the training shingles on the eval
    * axis, no product.
    *
    * @return one row per training doc:
    *   (idCol, n_shared BIGINT, contaminated INT)
    */
  def decontaminate(train: DataFrame, eval: DataFrame, n: Int,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val evalSh = Dedup.shingles(eval, n, idCol, textCol)
      .select(col("shingle")).distinct()
    val shared = Dedup.shingles(train, n, idCol, textCol)
      .join(broadcast(evalSh), "shingle")
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_shared"))
    train.select(col(idCol)).join(shared, Seq(idCol), "left")
      .na.fill(0L, Seq("n_shared"))
      .withColumn("contaminated", (col("n_shared") > 0).cast("int"))
  }

  /** Per-document boilerplate score: the fraction of a document's
    * distinct word-`n`-grams that occur in at least `minDocs`
    * documents corpus-wide (C4/RefinedWeb-style repeated-content
    * signal, word-shingle formulation).
    *
    * Scale shape: one shingle aggregation for global document
    * frequencies, one shingle-keyed join back, one per-doc count —
    * all hash aggregations with map-side partial combine; the only
    * shuffles are keyed by shingle and by document id.
    *
    * @return (idCol, n_shingles BIGINT, n_common BIGINT,
    *   boilerplate_ratio DOUBLE)
    */
  /** @param cacheShingles cache the thrice-read shingle table (default).
    *   The handle is registered with [[graft.OpCache]], so a long-lived
    *   service can `OpCache.release(session)` between requests instead
    *   of accumulating cached blocks until teardown; alternatively pass
    *   false and manage your own materialisation.
    */
  def boilerplateRatio(docs: DataFrame, n: Int, minDocs: Long,
                       idCol: String = "doc_id",
                       textCol: String = "text",
                       cacheShingles: Boolean = true): DataFrame = {
    val sh0 = Dedup.shingles(docs, n, idCol, textCol)
    val sh = if (cacheShingles) graft.OpCache.persist(sh0) else sh0
    val common = sh.groupBy(col("shingle"))
      .agg(count(lit(1)).as("dfc"))
      .filter(col("dfc") >= minDocs)
      .select(col("shingle"))
    val tot = sh.groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_shingles"))
    val com = sh.join(common, "shingle")
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_common"))
    tot.join(com, Seq(idCol), "left")
      .na.fill(0L, Seq("n_common"))
      .withColumn("boilerplate_ratio",
        col("n_common").cast("double") / col("n_shingles").cast("double"))
  }

  /** Cross-source contamination matrix: for every source pair, the
    * number of distinct word-`n`-grams present in BOTH — the audit a
    * corpus assembled from many crawls/providers runs before mixing,
    * where exact doc-level dedup sees nothing (shared passages hide in
    * otherwise-distinct documents). `shingles` keyed by SOURCE gives
    * each source's distinct gram set in one aggregation; the pair
    * counts then come from one gram-keyed `collect_set` whose buffers
    * are bounded by the SOURCE COUNT (never corpus-sized), with pairs
    * assembled in-plan from each ≤|sources| array — no shingle
    * self-join, no product anywhere. Output is ≤ sources² rows.
    *
    * @return (src_a, src_b, n_shared) with src_a < src_b
    */
  def sourceOverlap(docs: DataFrame, n: Int,
                    srcCol: String = "source",
                    textCol: String = "text"): DataFrame = {
    val sh = Dedup.shingles(docs.select(col(srcCol), col(textCol)),
      n, srcCol, textCol)
    val sets = sh.groupBy(col("shingle"))
      .agg(sort_array(collect_set(col(srcCol))).as("__ss"))
      .filter(size(col("__ss")) >= 2)
    sets.select(explode(flatten(transform(col("__ss"),
        (a, i) => transform(
          slice(col("__ss"), i + lit(2), size(col("__ss"))),
          b => struct(a.as("src_a"), b.as("src_b")))))).as("p"))
      .groupBy(col("p.src_a").as("src_a"), col("p.src_b").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
  }
}
