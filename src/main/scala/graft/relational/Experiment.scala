package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B experiment readout — the two-proportion z-test per metric that
  * an event pipeline runs to grade an experiment: users are split into
  * variants by a reproducible salted hash (the engine-independent
  * md5-threshold draw the sampling family already uses), a user
  * "converts" on a metric if they emitted that event type at least
  * once, and each metric row carries the pooled-variance z statistic
  * and its |z| > 1.96 verdict.
  *
  * Scale shape: variant assignment is a scan-side md5 projection; the
  * corpus-scale work is ONE distinct (user, event_type) aggregate plus
  * one distinct-user count — both map-side combinable. Per-variant
  * denominators are a 2-row aggregate broadcast into the scoring
  * projection; everything stays exact longs until the final rounded
  * arithmetic, so the statistic is engine-independent.
  */
object Experiment {

  /** Split threshold: md5 hex below "8" ⇒ variant A (exactly half the
    * 128-bit hash space), else B — lexicographic compare on the hex
    * string, identical in Spark and ANSI SQL.
    */
  private val HalfHex = "8"

  /** Per-event-type conversion readout.
    *
    * @return (metric, n_a, n_b, conv_a, conv_b, rate_a, rate_b,
    *         z, significant) — one row per event type
    */
  def abTest(events: DataFrame, userCol: String, metricCol: String,
             salt: String = "ab"): DataFrame = {
    def variantOf(u: org.apache.spark.sql.Column) = when(
      md5(concat(u.cast("string"), lit(":" + salt))) < HalfHex,
      lit("A")).otherwise(lit("B"))
    val users = events.select(col(userCol).as("u")).distinct()
      .select(variantOf(col("u")).as("variant"))
      .groupBy("variant").agg(count(lit(1)).as("n"))
    // pivot the 2-row variant counts into one broadcastable row
    val denoms = users.agg(
      max(when(col("variant") === "A", col("n"))).as("n_a"),
      max(when(col("variant") === "B", col("n"))).as("n_b"))
    val conv = events
      .select(col(metricCol).as("metric"), col(userCol).as("u"))
      .distinct()
      .select(col("metric"), variantOf(col("u")).as("variant"))
      .groupBy("metric").agg(
        sum(when(col("variant") === "A", 1L).otherwise(0L)).as("conv_a"),
        sum(when(col("variant") === "B", 1L).otherwise(0L)).as("conv_b"))
    val pA = col("conv_a").cast("double") / col("n_a")
    val pB = col("conv_b").cast("double") / col("n_b")
    val pooled = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b"))
    // the standard error is rounded 1e-9 before the ratio (the repo's
    // cross-engine float discipline), then z rounds 1e-6 on output
    val se = round(sqrt(pooled * (lit(1.0) - pooled) *
      (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 9)
    // se = 0 ⟺ every user (or none) converted in both arms — no
    // evidence either way; emit z = 0 instead of a divide-by-zero
    val z = when(se > 0.0,
      round((round(pA, 9) - round(pB, 9)) / se, 6)).otherwise(lit(0.0))
    conv.crossJoin(broadcast(denoms))
      .select(col("metric"), col("n_a"), col("n_b"),
        col("conv_a"), col("conv_b"),
        round(pA, 6).as("rate_a"), round(pB, 6).as("rate_b"),
        z.as("z"), (abs(z) > 1.96).as("significant"))
  }
}
