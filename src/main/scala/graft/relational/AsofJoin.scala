package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — attach to every left row the latest right row with
  * `rightTime <= leftTime` within the same key (backward inexact
  * join: trade ticks, feature snapshots, latest-config lookup).
  *
  * Spark has no native as-of join; the classic scalable formulation is
  * UNION + ordered window rather than an inequality join: tag right
  * rows, union with the left rows, sort each key partition once by
  * (time, rightness), and carry the right values forward with
  * `last(ignoreNulls)`. One shuffle on the key, one sort — the same
  * cost envelope as any window op, with NO range-join product and no
  * per-key state that grows with time span. An inequality join would
  * plan as BroadcastNestedLoopJoin (O(L×R) per key) or demand custom
  * binning.
  *
  * Semantics (matches the SQL-standard ASOF JOIN, e.g. DuckDB's):
  * inclusive at equality — a right row AT the left timestamp is
  * visible (right rows sort before left rows on ties); left rows with
  * no prior right row keep NULL. `right` must be unique per
  * (key, time) — pre-aggregate it otherwise (the join is then
  * deterministic; with duplicates "the" latest right row is undefined
  * in any engine).
  */
object AsofJoin {

  /** @param tolerance maximum staleness (same units as `timeCol`):
    * a carried right row older than `leftTime − tolerance` is treated
    * as no match (NULL values) — pandas `merge_asof(tolerance=...)`.
    * Costs nothing extra: the matched right time already rides the
    * carried struct, so the bound is one more projection-level
    * conditional, never a second window or join.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               keyCol: String, timeCol: String,
               valueCols: Seq[String],
               tolerance: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!valueCols.exists(leftCols.contains),
      s"value columns $valueCols collide with left columns")
    require(tolerance.forall(_ >= 0), "tolerance must be non-negative")
    // one unified schema: left rows carry null right-values, right
    // rows carry null left-payloads
    // the right payload travels as ONE struct per right row: the
    // carry-forward then picks the latest right ROW atomically — a
    // per-column last(ignoreNulls) would skip right rows whose value
    // is genuinely NULL (diverging from ASOF semantics, which attach
    // the latest row, NULLs included) and could stitch the columns of
    // DIFFERENT right rows into a tuple that never existed
    // the matched right TIME travels inside the struct too — the
    // tolerance bound (and any caller who wants match staleness)
    // reads it from the carried row
    val rightTagged = right.select(
      Seq(col(keyCol), col(timeCol), lit(1).as("__r"),
        struct(valueCols.map(col) :+ col(timeCol).as("__rt"): _*).as("__v")) ++
        leftCols.filterNot(Seq(keyCol, timeCol).contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val vStructType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType, nullable = true)) :+
        org.apache.spark.sql.types.StructField(
          "__rt", right.schema(timeCol).dataType, nullable = true))
    val leftTagged = left.select(
      Seq(col(keyCol), col(timeCol), lit(0).as("__r"),
        lit(null).cast(vStructType).as("__v")) ++
        leftCols.filterNot(Seq(keyCol, timeCol).contains).map(col): _*)
    // right rows sort BEFORE left rows at equal time (desc on the tag)
    // so equality is inclusive
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol).asc, col("__r").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = rightTagged.unionByName(leftTagged)
      .withColumn("__v", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__r") === 0)
    val bounded = tolerance match {
      case None => carried
      case Some(tol) => carried.withColumn("__v",
        when(col(s"__v.__rt") >= col(timeCol) - tol, col("__v")))
    }
    bounded
      .select((Seq(keyCol, timeCol) ++
        leftCols.filterNot(Seq(keyCol, timeCol).contains)).map(col) ++
        valueCols.map(c => col(s"__v.$c").as(c)): _*)
  }
}
