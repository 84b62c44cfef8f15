package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming interval (range) join — the stream twin of
  * [[graft.relational.RangeJoin]]: match point rows into interval rows
  * as both arrive on streams.
  *
  * Spark refuses a stream-stream join without an equality predicate,
  * and a bare inequality join couldn't bound state anyway — the batch
  * operator's BUCKETIZATION is exactly what makes the streaming join
  * legal and scalable: both sides map onto fixed-width time bins
  * (each interval explodes to the bins it covers, each point to
  * exactly one), the join becomes an equi join on the bin id with the
  * exact range residual, and the watermark time-range constraint
  * between the two event-time columns lets Spark evict joined state
  * as the watermarks advance. State per side is one watermark horizon
  * of rows per active bin — ingest rate × delay, independent of
  * stream length.
  *
  * A point meets an interval in exactly one bin (its own), so no
  * dedup pass is needed — same argument as the batch operator.
  * Inner-join rows emit as soon as both sides have arrived (no
  * watermark wait); late rows beyond `delay` are dropped by the
  * watermark like any streaming source.
  */
object IntervalStream {

  /** @param points streaming frame with event-time `timeCol`
    *   (TIMESTAMP) and payload columns
    * @param intervals streaming frame with event-time `startCol` and
    *   plain `endCol` (both TIMESTAMP) and payload columns; intervals
    *   longer than `maxIntervalLen` are rejected by the residual (the
    *   state-cleanup bound must dominate the true interval length)
    * @param binWidth micros per bin — near the typical interval
    *   length (same trade-off as the batch operator)
    * @param delay watermark delay for both sides
    * @param maxIntervalLen upper bound on interval length, as a SQL
    *   interval string — bounds how long point state must be retained
    */
  def pointsInIntervals(points: DataFrame, intervals: DataFrame,
                        timeCol: String, startCol: String, endCol: String,
                        binWidth: Long, delay: String,
                        maxIntervalLen: String): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(!points.columns.exists(intervals.columns.contains),
      "points and intervals must have disjoint column names")
    def q(name: String) = "`" + name.replace("`", "``") + "`"
    def binOf(c: String) = expr(s"unix_micros(${q(c)}) div ${binWidth}L")
    val p = points.withWatermark(timeCol, delay)
      .withColumn("__pbin", binOf(timeCol))
    val i = intervals.withWatermark(startCol, delay)
      .filter(col(endCol) >= col(startCol))
      .withColumn("__ibin",
        explode(sequence(binOf(startCol), binOf(endCol))))
    p.join(i,
      col("__pbin") === col("__ibin") &&
        col(timeCol) >= col(startCol) &&
        col(timeCol) < col(endCol) &&
        // the watermark-cleanup constraint: ties the two event-time
        // columns so both sides' state is evictable
        col(timeCol) <= col(startCol) + expr(s"INTERVAL $maxIntervalLen"))
      .drop("__pbin", "__ibin")
  }
}
