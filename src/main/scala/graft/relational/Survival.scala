package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation over an event stream — the churn
  * curve a product-analytics pipeline reports: each user's observed
  * lifetime runs from their first to their last event; users still
  * active near the stream's end (last event within `censorDays` of the
  * global max timestamp) are right-CENSORED — they contribute
  * at-risk exposure up to their last sighting without counting as a
  * churn. S(t) is the product-limit estimator over the life table:
  *
  *   S(t) = Π_{tᵢ ≤ t} (1 − dᵢ / nᵢ)
  *
  * with dᵢ churns at lifetime tᵢ and nᵢ users still at risk
  * (lifetime ≥ tᵢ; same-day censorings count at risk, the standard
  * censor-after-death convention).
  *
  * Scale shape: ONE per-user min/max aggregate (map-side combinable)
  * over the corpus-scale events, one 1-row global-max broadcast, then
  * everything runs on the LIFE TABLE — one row per distinct lifetime
  * in days, bounded by the observation window's length, never by
  * users. The cumulative windows on that bounded table use the
  * constant-key partition spec (the k-bounded-window discipline), so
  * no data-scale single-task window exists anywhere.
  *
  * Determinism: dᵢ and nᵢ are exact longs; each factor's log is FIXED
  * to a 1e-9-unit LONG (libm `ln` may differ at the last ULP across
  * engines) so the ordered cumulative sum is exact INTEGER arithmetic
  * — association-proof by construction, not by magnitude (summing
  * 1e-9-ROUNDED DOUBLES instead would reintroduce the reassociation
  * noise the changepoint/cusum fix eliminated; the r11 floatGate sweep
  * caught exactly that here). The survival output rounds 1e-6 after
  * exp over the exact sum.
  */
object Survival {

  /** @return the life table, one row per distinct observed lifetime
    *         with at least one churn or censoring:
    *         (duration_days, churned, censored, n_risk, survival)
    */
  def kaplanMeier(events: DataFrame, censorDays: Int = 7,
                  userCol: String = "user_id",
                  tsCol: String = "ts"): DataFrame = {
    require(censorDays >= 0, s"censorDays must be >= 0, got $censorDays")
    val perUser = events.groupBy(col(userCol).as("__u"))
      .agg(min(col(tsCol)).as("__first"), max(col(tsCol)).as("__last"))
    val horizon = events.agg(max(col(tsCol)).as("__hmax"))
    val lives = perUser.crossJoin(broadcast(horizon))
      .select(
        datediff(to_date(col("__last")), to_date(col("__first")))
          .cast("long").as("duration_days"),
        (col("__last") < col("__hmax") - expr(s"INTERVAL $censorDays DAYS"))
          .as("__churned"))
    val table = lives.groupBy("duration_days")
      .agg(sum(when(col("__churned"), 1L).otherwise(0L)).as("churned"),
        sum(when(col("__churned"), 0L).otherwise(1L)).as("censored"))
    // bounded windows: one row per distinct lifetime in days
    val k = graft.plans.PlanLint.kBoundedKey(col("duration_days"))
    val wPrev = Window.partitionBy(k).orderBy(col("duration_days"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.partitionBy(k).orderBy(col("duration_days"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = sum(col("churned") + col("censored"))
      .over(Window.partitionBy(k))
    val nRisk = total -
      coalesce(sum(col("churned") + col("censored")).over(wPrev), lit(0L))
    // the final table row can churn EVERYONE still at risk (factor 0):
    // ln is engine-hostile there (Spark null, DuckDB error), so the
    // zero factor is tracked as a flag and forces survival to exactly 0
    val factor = lit(1.0) - col("churned").cast("double") / col("n_risk")
    val logTerm9 = when(factor > 0.0, round(log(factor) * 1e9).cast("long"))
    val sawZero = sum(when(factor <= 0.0, 1L).otherwise(0L)).over(wCum)
    table
      .withColumn("n_risk", nRisk)
      .withColumn("survival",
        when(sawZero > 0, lit(0.0))
          .otherwise(round(exp(
            sum(logTerm9).over(wCum).cast("double") / 1e9), 6)))
      .select(col("duration_days"), col("churned"), col("censored"),
        col("n_risk"), col("survival"))
  }

  /** LOG-RANK test between two cohorts' churn curves — "do these two
    * groups churn differently" as one decision row (the survival-curve
    * companion of the Welch/two-proportion A/B tests): at every churn
    * time t, group 1's observed churns d₁ₜ are compared with the
    * hypergeometric expectation E₁ₜ = dₜ·n₁ₜ/nₜ under "same hazard",
    * and χ² = (Σ(d₁ₜ−E₁ₜ))² / ΣV₁ₜ with the standard variance term.
    *
    * Scale shape: per-cohort per-user min/max aggregates, then
    * EVERYTHING runs on the two-group life table (rows bounded by
    * distinct lifetimes × 2; its cumulative windows use the bounded
    * constant-key spec). Determinism: dₜ/nₜ are exact longs; each
    * time's (d₁−E₁) and V₁ terms are fixed to 1e-9 integers before the
    * cross-time sums; χ² is one closed form.
    *
    * @return one row (n_users_1, n_users_2, chi2, significant) —
    *   critical 3.841 = χ²(1) at α = 0.05, inlined-constant discipline
    */
  def logRank(eventsA: DataFrame, eventsB: DataFrame,
              censorDays: Int = 7, userCol: String = "user_id",
              tsCol: String = "ts", critical: Double = 3.841): DataFrame = {
    def lives(events: DataFrame, g: Int) = {
      val perUser = events.groupBy(col(userCol).as("__u"))
        .agg(min(col(tsCol)).as("__first"), max(col(tsCol)).as("__last"))
      val horizon = events.agg(max(col(tsCol)).as("__hmax"))
      perUser.crossJoin(broadcast(horizon))
        .select(lit(g).as("__g"),
          datediff(to_date(col("__last")), to_date(col("__first")))
            .cast("long").as("__t"),
          (col("__last") < col("__hmax") - expr(s"INTERVAL $censorDays DAYS"))
            .cast("long").as("__churn"))
    }
    // NOTE: each cohort censors against ITS OWN horizon — the cohorts
    // are separate frames by contract (the welchT shape)
    val lv = lives(eventsA, 1).unionByName(lives(eventsB, 2))
    val byT = lv.groupBy(col("__t"), col("__g"))
      .agg(sum(col("__churn")).as("__d"), count(lit(1)).as("__leave"))
    val times = byT.select(col("__t")).distinct()
    val dense = times.crossJoin(
        lv.sparkSession.range(1, 3).select(col("id").cast("int").as("__g")))
      .join(byT, Seq("__t", "__g"), "left")
      .na.fill(0L, Seq("__d", "__leave"))
    val k = graft.plans.PlanLint.kBoundedKey(col("__g"))
    val wPrev = Window.partitionBy(col("__g"), k).orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(col("__g"), k)
    val atRisk = dense.withColumn("__n",
      sum(col("__leave")).over(wTot) -
        coalesce(sum(col("__leave")).over(wPrev), lit(0L)))
    val wide = atRisk.groupBy(col("__t"))
      .agg(max(when(col("__g") === 1, col("__d"))).as("__d1"),
        max(when(col("__g") === 2, col("__d"))).as("__d2"),
        max(when(col("__g") === 1, col("__n"))).as("__n1"),
        max(when(col("__g") === 2, col("__n"))).as("__n2"))
      .withColumn("__dt", col("__d1") + col("__d2"))
      .withColumn("__nt", col("__n1") + col("__n2"))
      .filter(col("__dt") >= 1)
    val e1 = col("__dt").cast("double") * col("__n1") / col("__nt")
    val p1 = col("__n1").cast("double") / col("__nt")
    val v1 = when(col("__nt") <= 1, lit(0.0))
      .otherwise(col("__dt") * p1 * (lit(1.0) - p1) *
        (col("__nt") - col("__dt")).cast("double") / (col("__nt") - 1))
    val sums = wide.agg(
      sum(round((col("__d1") - e1) * 1e9).cast("long")).as("__oe9"),
      sum(round(v1 * 1e9).cast("long")).as("__v9"))
    val nA = eventsA.agg(countDistinct(col(userCol)).as("n_users_1"))
    val nB = eventsB.agg(countDistinct(col(userCol)).as("n_users_2"))
    val chi2 = (col("__oe9") / 1e9) * (col("__oe9") / 1e9) /
      (col("__v9") / 1e9)
    nA.crossJoin(broadcast(nB)).crossJoin(broadcast(sums))
      .select(col("n_users_1"), col("n_users_2"),
        when(col("__v9") === 0, lit(null).cast("double"))
          .otherwise(round(chi2, 6)).as("chi2"),
        when(col("__v9") === 0, lit(null).cast("boolean"))
          .otherwise(round(chi2 - critical, 6) > 0.0).as("significant"))
  }
}
