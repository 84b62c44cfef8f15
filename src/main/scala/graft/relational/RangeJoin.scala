package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join — match point rows `t` into interval rows
  * `[start, end)` with NO join key. Spark plans a bare inequality
  * join as BroadcastNestedLoopJoin: every point against every
  * interval, O(P×I) — fine only while one side is tiny.
  *
  * The scale path is BUCKETIZATION: both sides map onto fixed-width
  * time bins — each interval explodes to the bins it covers, each
  * point to exactly one — and the join becomes an EQUI join on the
  * bin id plus an exact residual filter. Work is O(P + I·bins + true
  * matches): proportional to actual overlap, shuffled on bin keys,
  * AQE-splittable when a hot bin (rush hour) skews. A point meets an
  * interval in exactly one bin (the point's own), so no dedup pass is
  * needed. Pick `binWidth` near the typical interval length: much
  * smaller multiplies interval replication, much larger degrades
  * toward per-bin products.
  *
  * Times must be non-negative (epoch micros): bin = t div binWidth
  * in INTEGER arithmetic — float division of epoch-scale longs loses
  * microseconds (53-bit mantissa).
  */
object RangeJoin {

  def intervalJoin(points: DataFrame, intervals: DataFrame,
                   timeCol: String, startCol: String, endCol: String,
                   binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(!points.columns.exists(intervals.columns.contains),
      "points and intervals must have disjoint column names — the join " +
        "key is synthetic, so a shared name would survive as an " +
        "ambiguous duplicate column")
    val p = points.withColumn("__bin", expr(s"$timeCol div ${binWidth}L"))
    // inverted intervals (end < start from a data-quality bug) must be
    // a cheap empty match, not an explosion: Spark's sequence(a, b)
    // counts DOWN when a > b, so a single swapped epoch-scale row
    // would otherwise generate millions of bin rows that the residual
    // filter then discards one by one
    val i = intervals.filter(col(endCol) >= col(startCol))
      .withColumn("__bin",
        explode(sequence(expr(s"$startCol div ${binWidth}L"),
          expr(s"$endCol div ${binWidth}L"))))
    p.join(i, Seq("__bin"))
      .filter(col(timeCol) >= col(startCol) && col(timeCol) < col(endCol))
      .drop("__bin")
  }
}
