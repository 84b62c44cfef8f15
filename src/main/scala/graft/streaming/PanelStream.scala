package graft.streaming

import graft.Panel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.LongType

/** Streaming panel ingestion — the engine's readStream → transform →
  * writeStream path. The reference's batch ingest (a DB snapshot
  * aggregated into the (time, unit) panel) becomes an event-time
  * windowed aggregation with a watermark: each (day-window, unit) panel
  * cell is emitted exactly once when the watermark passes the window
  * end, and per-window state is dropped afterwards — state stays
  * bounded by (watermark horizon × active units), independent of total
  * stream length.
  *
  * Downstream, closed panel cells append to a partitioned sink
  * (`writeParquet`) that batch transforms read as an ordinary panel —
  * the same lambda-free "stream fills the table, batch queries the
  * table" layout a 100 TB deployment would use. Stateful per-unit
  * transforms that must react in-stream (tick_time_since) live in
  * [[TickStream]] via flatMapGroupsWithState.
  */
object PanelStream {

  /** Streaming analogue of Panel.fromEvents: 1-day event-time windows
    * per user, watermarked with `delay`. Append-mode output: one row
    * per closed (day, unit) cell, keyed by the window-start DATE — a
    * collision-free key for streams of any length (day-of-month would
    * merge the 15th of January and February). `toPanel` folds the sink
    * into the harness's panel convention batch-side.
    */
  def panelAggregate(events: DataFrame, delay: String = "1 day"): DataFrame = {
    // reuse an upstream watermark on ts (e.g. set by dedupEvents) —
    // Spark disallows redefining one mid-stream, so when the caller
    // already watermarked ts, THAT delay governs lateness and the
    // `delay` parameter is superseded (logged below when they differ,
    // so the supersession is visible rather than silent). EVERY
    // watermark node in the plan is validated — a union of
    // differently-watermarked branches must have all of them on ts,
    // since a watermark on any OTHER column would leave the ts windows
    // unbounded (append mode would never emit); that is rejected
    // rather than silently accepted.
    val upstreams = events.queryExecution.analyzed.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark => w
    }
    upstreams.find(_.eventTime.name != "ts").foreach { w =>
      throw new IllegalArgumentException(
        s"panelAggregate aggregates on ts, but the input carries a " +
          s"watermark on '${w.eventTime.name}' — watermark ts instead")
    }
    if (upstreams.nonEmpty) {
      val want = org.apache.spark.sql.catalyst.util.IntervalUtils
        .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(delay))
      upstreams.filterNot(_.delay == want).foreach { w =>
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"panelAggregate(delay=$delay): reusing upstream ts watermark " +
            s"with delay '${w.delay}' — the delay parameter is superseded")
      }
    }
    val wm = if (upstreams.nonEmpty) events else events.withWatermark("ts", delay)
    // value aggregation mirrors the batch panel's r14 integer
    // discipline (Panel.fromEvents): per-event 1e-9 fixings summed as
    // longs, one division back — a float SUM's last ULP depends on the
    // micro-batch/merge schedule, so two replays of the same stream
    // could legitimately emit different final bits; the integer sum
    // makes the materialised panel replay- and engine-deterministic.
    wm
      .groupBy(window(col("ts"), "1 day").as("w"),
        col("user_id").cast("long").as(Panel.UnitCol))
      .agg((sum(Panel.fix9(col("value"))).cast("double") / lit(1e9)).as("value"),
        count(lit(1)).cast("double").as("value2"),
        // the integer sum itself rides along (r15, ADVICE r14): the
        // double round-trip value·1e9 is only exact below ~2^53 in
        // 1e-9 units (~1e6 feature units per day cell) — far below
        // the ~9.2e9-unit long headroom — so the monthly fold
        // consumes THIS column and never re-quantizes a double
        sum(Panel.fix9(col("value"))).as("value9"))
      .select(to_date(col("w.start")).as("day"),
        col(Panel.UnitCol), col("value"), col("value2"), col("value9"))
  }

  /** Streaming ingest dedup: drop re-delivered events by id while the
    * watermark can still see them — at-least-once transport (Kafka
    * retries, file re-lists) becomes effectively-once ingest. State is
    * one id per event inside the watermark horizon and is evicted as
    * the watermark advances, so memory is bounded by event rate ×
    * delay, not stream length. Chain BEFORE `panelAggregate` (it
    * reuses the same watermark).
    */
  def dedupEvents(events: DataFrame, delay: String = "1 day"): DataFrame =
    events.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Batch fold of the streamed day cells into the panel convention
    * (month_id = day-of-month, summing across months like
    * Panel.fromEvents does): run over the parquet sink — or, for
    * equivalence checks, directly over panelAggregate's plan in batch
    * mode, where the watermark is a no-op.
    */
  def toPanel(dayCells: DataFrame): DataFrame = {
    // prefer the carried integer column (r15, ADVICE r14): summing the
    // longs directly is exact up to the full ~9.2e18 headroom, where
    // re-fixing the double day-cell value is only exact below ~2^53 in
    // 1e-9 units (~1e6 feature units per day cell). Sinks written
    // before the column existed still fold via the re-fix (its
    // exactness bound now documented above), so old data stays
    // readable.
    val v9 = if (dayCells.columns.contains("value9")) col("value9")
             else Panel.fix9(col("value"))
    dayCells
      .groupBy(dayofmonth(col("day")).cast("long").as(Panel.TimeCol),
        col(Panel.UnitCol))
      .agg((sum(v9).cast("double") / lit(1e9)).as("value"),
        sum(col("value2")).as("value2"))
  }

  /** File-stream source over the events parquet layout (same
    * TIMESTAMP(NANOS) handling as the batch Panel.readEvents).
    *
    * The file-stream source monitors directories only; a production
    * deployment points it at a directory of arriving part files, while
    * the test layout ships `events.parquet` as a single file — in that
    * case we monitor the parent directory with a glob filter so both
    * layouts stream.
    */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema
    val fsPath = new org.apache.hadoop.fs.Path(path)
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val reader = spark.readStream.schema(schema)
    val ev =
      if (fs.getFileStatus(fsPath).isDirectory) reader.parquet(path)
      else reader.option("pathGlobFilter", fsPath.getName).parquet(dir)
    // same nanos-as-long / TIMESTAMP_NTZ normalization as the batch
    // reader (Panel.normalizeTs) — NTZ would break event-time
    // watermarks (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE)
    Panel.normalizeTs(ev)
  }

  /** Append sink: day-partitioned parquet + checkpoint — the stream
    * side of the stream-fills / batch-reads layout (batch jobs fold it
    * with `toPanel`).
    */
  def writeParquet(panel: DataFrame, path: String,
                   checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    panel.writeStream
      .format("parquet")
      .partitionBy("day")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
}
