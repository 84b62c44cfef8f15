package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed storage layout — the shuffle-elimination lever for
  * repeated fact-fact joins at 100 TB: write both sides bucketed (and
  * sorted) by the join key once, and every subsequent equi-join on
  * that key plans with NO Exchange on either input (Spark's bucketing
  * contract: bucket count and key equality let the SortMergeJoin read
  * co-located buckets directly; the sort files even skip the Sort).
  * One shuffle paid at write time amortizes over every downstream
  * join/aggregation on the key — the difference between re-shuffling
  * a 100 TB fact table per query and never shuffling it again.
  *
  * Spark's native bucketing rides the session catalog
  * (`bucketBy().sortBy().saveAsTable()` — a plain path write cannot
  * carry bucket metadata), so callers pass table names; data lands at
  * the explicit `path`, making the tables external and the layout
  * inspectable.
  */
object Bucketing {

  /** Write `df` bucketed+sorted by `key` as external table `table`
    * at `path`. The one-time shuffle that buys shuffle-free joins.
    */
  def writeBucketed(df: DataFrame, path: String, table: String,
                    key: String, buckets: Int): Unit = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Equi-join two same-bucketed tables on their bucket key — plans
    * exchange-free on both inputs (PlanSpec-pinned).
    */
  def bucketedJoin(spark: SparkSession, leftTable: String,
                   rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
