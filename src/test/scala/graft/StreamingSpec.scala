package graft

import graft.streaming.TickStream
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
}
