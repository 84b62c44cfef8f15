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
}
