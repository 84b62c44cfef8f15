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
  * Determinism: dᵢ and nᵢ are exact longs; each factor's log rounds
  * 1e-9 before the ordered cumulative sum (the PageRank per-iteration
  * discipline — libm `ln` may differ at the last ULP across engines),
  * and the survival output rounds 1e-6.
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
    val k = pmod(xxhash64(col("duration_days")), lit(1))
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
    val logTerm = when(factor > 0.0, round(log(factor), 9))
    val sawZero = sum(when(factor <= 0.0, 1L).otherwise(0L)).over(wCum)
    table
      .withColumn("n_risk", nRisk)
      .withColumn("survival",
        when(sawZero > 0, lit(0.0))
          .otherwise(round(exp(sum(logTerm).over(wCum)), 6)))
      .select(col("duration_days"), col("churned"), col("censored"),
        col("n_risk"), col("survival"))
  }
}
