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
  * microseconds (53-bit mantissa). `div` truncates toward zero, so a
  * negative time would bin WITH its positive mirror (−1 and 1 both →
  * bin 0) and break the one-bin-per-point argument; the contract is
  * asserted below.
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
    // backtick-quote interpolated caller names so columns like
    // `event time` survive the SQL round-trip; literal backticks in a
    // name are escaped by doubling, per SQL identifier rules
    def q(name: String) = "`" + name.replace("`", "``") + "`"
    def binOf(c: String) = expr(s"${q(c)} div ${binWidth}L")
    // non-negative-time contract, enforced: assert_true returns NULL on
    // success, so the filter passes every valid row while a NEGATIVE
    // time fails the query loudly instead of silently mis-binning. A
    // NULL time is ordinary missing data, not a contract violation —
    // the isNull disjunct lets it through, and its NULL __bin then
    // drops out of the inner join (the pre-assert behaviour). As a
    // filter predicate the assert rides the existing scan pass (no
    // extra job) and cannot be pruned the way an unused projected
    // column would be.
    def nonNegOrNull(c: String) = assert_true(
      col(c).isNull || col(c) >= 0, lit(s"intervalJoin: negative $c")).isNull
    val p = points
      .filter(nonNegOrNull(timeCol))
      .withColumn("__bin", binOf(timeCol))
    // inverted intervals (end < start from a data-quality bug) must be
    // a cheap empty match, not an explosion: Spark's sequence(a, b)
    // counts DOWN when a > b, so a single swapped epoch-scale row
    // would otherwise generate millions of bin rows that the residual
    // filter then discards one by one
    val i = intervals.filter(col(endCol) >= col(startCol))
      .filter(nonNegOrNull(startCol))
      .withColumn("__bin",
        explode(sequence(binOf(startCol), binOf(endCol))))
    p.join(i, Seq("__bin"))
      .filter(col(timeCol) >= col(startCol) && col(timeCol) < col(endCol))
      .drop("__bin")
  }

  /** Interval–interval OVERLAP join (temporal join): match left
    * `[s1, e1)` with right `[s2, e2)` when they overlap —
    * `s1 < e2 ∧ s2 < e1`. Same bucketization discipline as
    * [[intervalJoin]]: both sides explode to their covered bins and
    * the overlap becomes an equi join on bin plus the exact residual.
    * An overlapping pair shares every bin of its intersection, so
    * matches dedup WITHOUT a distinct pass: the pair is emitted only
    * from the intersection's FIRST bin, `bin(max(s1, s2))` — a bin
    * both sides provably cover (the point max(s1, s2) lies in both
    * half-open intervals whenever they overlap), computed per row
    * with no extra shuffle.
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
                          s1: String, e1: String,
                          s2: String, e2: String,
                          binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(!left.columns.exists(right.columns.contains),
      "left and right must have disjoint column names")
    def q(name: String) = "`" + name.replace("`", "``") + "`"
    def binOf(c: String) = expr(s"${q(c)} div ${binWidth}L")
    def nonNegOrNull(c: String) = assert_true(
      col(c).isNull || col(c) >= 0, lit(s"intervalOverlapJoin: negative $c")).isNull
    def side(df: DataFrame, s: String, e: String) = df
      .filter(col(e) >= col(s))
      .filter(nonNegOrNull(s))
      .withColumn("__bin", explode(sequence(binOf(s), binOf(e))))
    side(left, s1, e1)
      .join(side(right, s2, e2).withColumnRenamed("__bin", "__bin2"),
        col("__bin") === col("__bin2"))
      .filter(col(s1) < col(e2) && col(s2) < col(e1))
      .filter(col("__bin") === greatest(binOf(s1), binOf(s2)))
      .drop("__bin", "__bin2")
  }
}
