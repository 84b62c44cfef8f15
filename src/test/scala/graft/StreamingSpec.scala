package graft

import graft.streaming.{PanelStream, TickStream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Drives tick_time_since through an actual Structured Streaming query
  * (MemoryStream source → flatMapGroupsWithState → memory sink) to prove
  * the operator's state handling across micro-batches, not just the
  * batch path.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("tick_time_since state carries across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[TickStream.PanelRow]
    val q = TickStream.tickTimeSince(source.toDS())
      .writeStream.format("memory").queryName("ticks")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: months 1-3 (event at month 3)
      source.addData(
        TickStream.PanelRow(1L, 1L, 0.0),
        TickStream.PanelRow(1L, 2L, 0.0),
        TickStream.PanelRow(1L, 3L, 1.0))
      q.processAllAvailable()
      // batch 2: months 4-6 — state must remember month 3's event
      source.addData(
        TickStream.PanelRow(1L, 4L, 1.0),
        TickStream.PanelRow(1L, 5L, 0.0),
        TickStream.PanelRow(1L, 6L, 0.0))
      q.processAllAvailable()
      val out = spark.table("ticks").as[TickStream.TickOut]
        .collect().sortBy(_.month_id).map(_.tick).toSeq
      // reference semantics: ., 1, 2, 0, 0, 1
      assert(out == Seq(None, Some(1.0), Some(2.0), Some(0.0), Some(0.0), Some(1.0)))
    } finally q.stop()
  }

  test("watermarked windowed aggregation builds the panel incrementally") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    val src = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val q = PanelStream.panelAggregate(
        src.toDS().toDF("ts", "user_id", "value"), delay = "1 hour")
      .writeStream.format("memory").queryName("panel_stream")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: two days of events — windows stay open (watermark at
      // max event time − 1h, before both window ends)
      src.addData(
        (ts("2024-01-01T01:00:00Z"), 1L, 2.0),
        (ts("2024-01-01T02:00:00Z"), 1L, 3.0),
        (ts("2024-01-01T01:00:00Z"), 2L, 4.0),
        (ts("2024-01-02T00:30:00Z"), 1L, 5.0))
      q.processAllAvailable()
      assert(spark.table("panel_stream").count() == 0)
      // batch 2: a day-4 event pushes the watermark past both window
      // ends — closed cells emit exactly once, matching the batch panel
      src.addData((ts("2024-01-04T06:00:00Z"), 9L, 0.0))
      q.processAllAvailable()
      val out = spark.table("panel_stream").collect()
        .map(r => (r.getDate(0).toString, r.getLong(1)) ->
          (r.getDouble(2), r.getDouble(3)))
        .toMap
      assert(out == Map(
        ("2024-01-01", 1L) -> (5.0, 2.0),   // sum 2+3, count 2
        ("2024-01-01", 2L) -> (4.0, 1.0),
        ("2024-01-02", 1L) -> (5.0, 1.0)))
    } finally q.stop()
  }

  test("sessionize runs under readStream: sessions merge, close on watermark") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    val src = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val q = graft.streaming.Sessions.sessionize(
        src.toDS().toDF("ts", "user_id", "value")
          .withWatermark("ts", "1 hour"), gapSeconds = 600)
      .writeStream.format("memory").queryName("sessions_stream")
      .outputMode(OutputMode.Append).start()
    try {
      // two events 5 min apart — one open session; nothing emits while
      // the watermark is behind the session close
      src.addData(
        (ts("2024-01-01T00:00:00Z"), 1L, 1.0),
        (ts("2024-01-01T00:05:00Z"), 1L, 2.0))
      q.processAllAvailable()
      assert(spark.table("sessions_stream").count() == 0)
      // a much later event closes the session past the watermark AND
      // must land in a NEW session (gap >> 600s); the merged first
      // session emits exactly once with both events aggregated
      src.addData((ts("2024-01-01T06:00:00Z"), 1L, 4.0))
      q.processAllAvailable()
      val out = spark.table("sessions_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getDouble(4)))
      val startUs = ts("2024-01-01T00:00:00Z").getTime * 1000L
      assert(out.toSeq == Seq((1L, startUs, 2L, 3.0)))
    } finally q.stop()
  }

  test("dedupEvents drops cross-batch redeliveries within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    val src = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val q = PanelStream.dedupEvents(
        src.toDS().toDF("event_id", "ts", "value"), delay = "1 hour")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append).start()
    try {
      src.addData((1L, ts("2024-01-01T00:00:00Z"), 1.0),
        (2L, ts("2024-01-01T00:01:00Z"), 2.0))
      q.processAllAvailable()
      // batch 2 redelivers event 1 (same id, same watermark horizon)
      src.addData((1L, ts("2024-01-01T00:00:00Z"), 1.0),
        (3L, ts("2024-01-01T00:02:00Z"), 3.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("stateless registry transforms apply to a stream unchanged") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, Long, Double)]
    // pointwise wire-format spec composed directly onto the stream —
    // stateless Column transforms are streaming-safe by construction
    val q = Registry.run(src.toDS().toDF(Panel.TimeCol, Panel.UnitCol, "value"),
        """[{"type":"ln"},{"type":"decay","args":[2]}]""")
      .writeStream.format("memory").queryName("reg_stream")
      .outputMode(OutputMode.Append).start()
    try {
      src.addData((1L, 1L, 0.0), (2L, 1L, 3.0))
      q.processAllAvailable()
      val out = spark.table("reg_stream").collect()
        .map(r => r.getLong(0) -> r.getDouble(2)).toMap
      def expect(v: Double) = math.pow(2.0, -math.log1p(v) / 2.0)
      assert(math.abs(out(1L) - expect(0.0)) < 1e-12)
      assert(math.abs(out(2L) - expect(3.0)) < 1e-12)
    } finally q.stop()
  }
}
