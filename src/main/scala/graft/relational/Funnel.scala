package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered conversion funnel over an event stream: step i counts only
  * when it happens STRICTLY after the user's first completion of step
  * i−1 (the standard product-analytics funnel — a purchase logged
  * before the first view does not convert that view).
  *
  * Plan shape, chosen for event-stream scale: ONE filtered
  * min-aggregation per step over the raw events (map-side combined,
  * user-keyed — k bounded small), each stage's per-user gate table is
  * ≤ |users| rows and joins user-keyed into the next stage's
  * aggregation. No window over the raw stream, no event self-join, no
  * ordering pass — the stream is touched k times as a filter+agg scan
  * that AQE can overlap, and everything after is |users|-sized.
  */
object Funnel {

  /** Per-user funnel stage times: (user, t_1 .. t_k) in epoch micros,
    * t_i null once the funnel stalls (strictly-after gate unmet).
    */
  def funnelTimes(events: DataFrame, steps: Seq[String],
                  userCol: String = "user_id",
                  typeCol: String = "event_type",
                  tsCol: String = "ts",
                  maxGapSec: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.length == steps.length,
      s"funnel steps must be distinct: $steps")
    require(maxGapSec.forall(_ > 0), "maxGapSec must be positive")
    val base = events.select(col(userCol), col(typeCol),
      unix_micros(col(tsCol)).as("__t"))
    val first = base.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col("__t")).as("t_1"))
    steps.zipWithIndex.drop(1).foldLeft(first) { case (acc, (s, i)) =>
      val prior = (1 to i).map(j => col(s"t_$j"))
      val gate = maxGapSec match {
        case None => col("__t") > col(s"t_$i")
        case Some(g) => col("__t") > col(s"t_$i") &&
          col("__t") <= col(s"t_$i") + g * 1000000L
      }
      acc.join(base.filter(col(typeCol) === s).drop(typeCol),
          Seq(userCol), "left")
        .groupBy((col(userCol) +: prior): _*)
        .agg(min(when(gate, col("__t"))).as(s"t_${i + 1}"))
    }
  }

  /** The funnel report: one row per step — (stage, step, n_users) with
    * n_users the count of users whose funnel reached that step.
    */
  def funnel(events: DataFrame, steps: Seq[String],
             userCol: String = "user_id",
             typeCol: String = "event_type",
             tsCol: String = "ts",
             maxGapSec: Option[Long] = None): DataFrame = {
    val t = funnelTimes(events, steps, userCol, typeCol, tsCol, maxGapSec)
    val counts = t.agg(
      count(col("t_1")).as("c_1"),
      steps.indices.drop(1).map(i =>
        count(col(s"t_${i + 1}")).as(s"c_${i + 1}")): _*)
    counts.select(explode(array(steps.zipWithIndex.map { case (s, i) =>
        struct(lit(i + 1).as("stage"), lit(s).as("step"),
          col(s"c_${i + 1}").as("n_users"))
      }: _*)).as("f"))
      .select(col("f.stage").as("stage"), col("f.step").as("step"),
        col("f.n_users").as("n_users"))
  }

  /** Cohort retention matrix: users bucket into the period of their
    * first event (cohort); each (cohort, offset) cell counts the
    * users of that cohort active `offset` periods later — the classic
    * engagement triangle. Period arithmetic is integer `div` over
    * epoch micros (float division of ~1e15 micros drifts at period
    * boundaries).
    *
    * Shape: one user-keyed min-aggregation (first period), one
    * user-keyed join back, one (cohort, offset, user) distinct and
    * one count — all keyed shuffles, output ≤ periods² rows however
    * large the stream.
    *
    * @return (cohort_period, period_offset, n_users)
    */
  def retention(events: DataFrame, periodSec: Long = 7L * 86400L,
                userCol: String = "user_id",
                tsCol: String = "ts"): DataFrame = {
    require(periodSec > 0, s"periodSec must be positive, got $periodSec")
    val perMicros = periodSec * 1000000L
    val base = events.select(col(userCol),
      expr(s"unix_micros(`${tsCol.replace("`", "``")}`) div ${perMicros}L")
        .as("__w"))
    val cohorts = base.groupBy(col(userCol))
      .agg(min(col("__w")).as("cohort_period"))
    base.join(cohorts, userCol)
      .select(col("cohort_period"),
        (col("__w") - col("cohort_period")).as("period_offset"),
        col(userCol))
      .distinct()
      .groupBy(col("cohort_period"), col("period_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
