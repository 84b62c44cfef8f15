package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    *
    * `value` is derived MERGE-ORDER-INVARIANTLY (r14): each event value
    * is fixed to a 1e-9-unit long at the scan ([[fix9]]) and the cell
    * total is an INTEGER sum — a float `SUM(value)` is reassociation-
    * dependent in its last ULP (reversing the event order perturbs
    * ~13% of cells at ~1e-13 on the gate data), so two engines (or two
    * partition layouts of one engine) legitimately disagree on the
    * final bits, and any downstream consumer that re-quantizes the
    * panel on a fine grid (the cusum family's 1e-9 fixing — the
    * project's only recurring driver-only hash flip, r08–r13) sits on
    * that noise. An integer sum is exact under ANY merge schedule, and
    * the single long→double division back to feature space is one
    * correctly-rounded IEEE op both engines perform identically. The
    * semantic shift is ≤ 0.5e-9 per event. Headroom: |Σ v9| must stay
    * inside a long — |cell value total| · 1e9 < 9.2e18, i.e. per-cell
    * totals below ~9.2e9 in feature units; beyond that, ANSI mode
    * (the Spark 4 default) fails the sum loudly rather than wrapping.
    */
  def fromEvents(spark: SparkSession, dir: String): DataFrame =
    fromEvents9(spark, dir)
      .withColumn("value", col("v9").cast("double") / lit(1e9))
      .drop("v9")

  /** One event value on the canonical 1e-9 integer grid — the panel's
    * scan-side fixing, shared by the batch plans and the streaming
    * twins. Per-event doubles read from parquet are identical bits in
    * every engine, the multiply is one correctly-rounded IEEE op, and
    * a single-value half-away-from-zero round is engine-stable off
    * exact .5 ties (both Spark's HALF_UP and DuckDB's round() resolve
    * ties away from zero, so even a tie agrees).
    */
  def fix9(c: Column): Column = round(c * lit(1e9)).cast("long")

  /** The sparse panel on the integer grid: `v9 = Σ_events fix9(value)`
    * per (month, unit) cell — the exact-integer input of the 1e-9
    * re-quantizing consumers (cusum/changepoint class), with no float
    * round-trip at all.
    */
  def fromEvents9(spark: SparkSession, dir: String): DataFrame = {
    val ev = readEvents(spark, dir)
    ev.groupBy(
        dayofmonth(col("ts")).cast("long").as(TimeCol),
        col("user_id").cast("long").as(UnitCol))
      .agg(
        sum(fix9(col("value"))).as("v9"),
        count(lit(1)).cast("double").as("value2"))
  }

  /** Dense integer-grid panel (v9 long, missing cells = 0) — the cusum
    * twins' wire input: per-event integer fixings, integer cell sums,
    * dense reindex, not one float anywhere upstream of the operator.
    */
  def densePanel9(spark: SparkSession, dir: String): DataFrame = {
    val cells = fromEvents9(spark, dir).select(col(TimeCol), col(UnitCol), col("v9"))
    val months = cells.select(TimeCol).distinct()
    val units = cells.select(UnitCol).distinct()
    broadcast(months).crossJoin(units)
      .join(cells, Seq(TimeCol, UnitCol), "left")
      .na.fill(0L, Seq("v9"))
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
