package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semi-structured source handling: typed JSON extraction and
  * wide-format reshapes over an event log.
  *
  * `from_json` with an explicit schema keeps extraction inside
  * whole-stage codegen with one parse per row (no per-field re-parse
  * the way repeated `get_json_object` calls would), and malformed
  * documents yield typed NULLs instead of failing the scan — the
  * behaviour a 100 TB ingest needs when a fraction of rows is always
  * junk.
  */
object SemiStructured {

  /** Parse a JSON string column into typed fields with an explicit
    * DDL schema, e.g. `extractJson(events, "props", "k BIGINT")` →
    * adds top-level columns for each schema field.
    */
  def extractJson(df: DataFrame, jsonCol: String, ddl: String): DataFrame =
    df.withColumn("__j", from_json(col(jsonCol), ddl,
        new java.util.HashMap[String, String]()))
      .select(df.columns.map(col) :+ col("__j.*"): _*)

  /** Per-type aggregate over the typed extraction: event count, sum of
    * the extracted `k`, and value total — the shape of a
    * sessionless event rollup.
    */
  def propsRollup(events: DataFrame): DataFrame =
    extractJson(events, "props", "k BIGINT")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n_events"),
        sum(col("k")).cast("long").as("sum_k"),
        sum(col("value")).as("sum_value"))

  /** Long→wide reshape: one row per user, one count column per event
    * type. The type list is EXPLICIT — with it, Spark's pivot skips
    * the extra distinct-values job and the output schema is stable
    * whatever subset of types a partition of the data contains.
    */
  def pivotEventCounts(events: DataFrame, types: Seq[String]): DataFrame =
    events.groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
}
