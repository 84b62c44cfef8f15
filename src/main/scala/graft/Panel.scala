package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Canonical panel abstraction: a long/tidy table keyed by
  * `(month_id, unit_id)` with one or more double-typed feature columns.
  *
  * Mirrors the reference's fundamental data model — a pandas frame indexed
  * by `(timevar, groupvar)` (views_2.py:3-4) that must form a complete
  * time × unit cross-product for tensor-shaped transforms
  * (utilities.py:26-27). Here the dense cross-product is an explicit,
  * Catalyst-optimizable reindex (`dense`) rather than an implicit
  * tensorisation.
  *
  * At 100 TB the panel arrives partitioned by `month_id` (partition
  * pruning) and the per-unit window family below induces exactly one
  * hash-partition shuffle on `unit_id`, after which every window op in a
  * chain reuses the same partitioning (Catalyst collapses adjacent Window
  * nodes over the same spec).
  */
object Panel {
  val TimeCol = "month_id"
  val UnitCol = "unit_id"

  /** Per-unit time window — the single shuffle all temporal ops share. */
  def w: WindowSpec =
    Window.partitionBy(UnitCol).orderBy(TimeCol)

  /** w with a trailing row frame of `n` rows (current row included). */
  def trailing(n: Int): WindowSpec = w.rowsBetween(-(n - 1), 0)

  /** Cumulative (expanding) frame. */
  def cumulative: WindowSpec = w.rowsBetween(Window.unboundedPreceding, 0)

  /** Sparse aggregated panel derived from the driver's `events` table:
    * time = day-of-month of `ts` (the synthetic data spans one calendar
    * month), unit = `user_id`, features `value` (sum of event values) and
    * `value2` (event count, as double). Keys cast to long so the Spark
    * schema matches DuckDB's BIGINT aggregation keys in the oracle.
    */
  def fromEvents(spark: SparkSession, dir: String): DataFrame = {
    val ev = readEvents(spark, dir)
    ev.groupBy(
        dayofmonth(col("ts")).cast("long").as(TimeCol),
        col("user_id").cast("long").as(UnitCol))
      .agg(
        sum(col("value")).as("value"),
        count(lit(1)).cast("double").as("value2"))
  }

  /** events.parquet carries TIMESTAMP(NANOS), which Spark 4 refuses by
    * default; read nanos as long and rebuild a (UTC) timestamp column.
    * Microsecond-precision files instead surface ts as TIMESTAMP_NTZ,
    * which `unix_micros`/`session_window`/watermarks reject — cast to
    * TimestampType (session tz is pinned UTC in every entrypoint, so
    * the instant is preserved).
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$dir/events.parquet")
    normalizeTs(ev)
  }

  /** Normalize the `ts` column to session-tz TimestampType whatever the
    * parquet surfaced (nanos-as-long, TIMESTAMP_NTZ, or already LTZ).
    */
  def normalizeTs(ev: DataFrame): DataFrame =
    ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer `div`, NOT `/`: epoch nanos (~1.7e18) exceed a double's
        // 53-bit mantissa, so float division is off by ±hundreds of ns —
        // visible as off-by-one microseconds after truncation
        ev.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        ev.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => ev
    }

  /** Dense cross-product reindex: every (month, unit) pair present,
    * missing feature cells filled with `fill` (reference transforms
    * coerce `fillna(0.0)` on entry — spatial_tree.py:29, splag4d.py:51).
    *
    * `months` is tiny (≤ #distinct timesteps) so it broadcasts; the left
    * join back onto the data shuffles on the composite key once.
    */
  def dense(panel: DataFrame, featureCols: Seq[String], fill: Double = 0.0): DataFrame = {
    val months = panel.select(TimeCol).distinct()
    val units = panel.select(UnitCol).distinct()
    broadcast(months).crossJoin(units)
      .join(panel, Seq(TimeCol, UnitCol), "left")
      .na.fill(fill, featureCols)
  }

  /** The canonical dense two-feature panel used by the oracle queries. */
  def densePanel(spark: SparkSession, dir: String): DataFrame =
    dense(fromEvents(spark, dir), Seq("value", "value2"))

  /** Deterministic missingness injected into `value` (cells where
    * `(unit_id*31 + month_id) % 7 == 0`), for exercising the
    * missing-data operator family against the DuckDB oracle.
    */
  def withMissing(panel: DataFrame): DataFrame =
    panel.withColumn(
      "value",
      when((col(UnitCol) * 31 + col(TimeCol)) % 7 === 0, lit(null).cast("double"))
        .otherwise(col("value")))

  def missingPanel(spark: SparkSession, dir: String): DataFrame =
    withMissing(densePanel(spark, dir))
}
