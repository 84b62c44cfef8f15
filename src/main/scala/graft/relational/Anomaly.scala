package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust per-group anomaly flags over an event stream: each event's
  * (value − group median) / group IQR robust z-score, plus a breach
  * flag at `k` — the outlier screen that survives heavy-tailed metric
  * distributions where mean/σ z-scores drown in their own outliers.
  *
  * Scale shape: group stats come from ONE aggregation (rows = distinct
  * groups — event types, not events) broadcast back onto the stream;
  * NOT a per-group window, which would funnel each event type's whole
  * history into a single task. The breach margin rounds at 1e-6 before
  * comparison (the cusum discipline) so borderline scores resolve
  * identically across engines.
  */
object Anomaly {

  def robustFlags(events: DataFrame, k: Double = 3.0,
                  groupCol: String = "event_type",
                  valueCol: String = "value",
                  idCol: String = "event_id"): DataFrame =
    robustFlagsAgainst(events, fitBaseline(events, groupCol, valueCol),
      k, groupCol, valueCol, idCol)

  /** The per-group median/IQR baseline fit — (groupCol, __med, __iqr),
    * one aggregation over the training window.
    */
  def fitBaseline(events: DataFrame,
                  groupCol: String = "event_type",
                  valueCol: String = "value"): DataFrame =
    events.groupBy(col(groupCol)).agg(
      percentile(col(valueCol), lit(0.5)).as("__med"),
      (percentile(col(valueCol), lit(0.75)) -
        percentile(col(valueCol), lit(0.25))).as("__iqr"))

  /** Score against a FITTED baseline — the STREAMING path: the stats
    * table is static, the score is a stateless projection after a
    * broadcast join, so the identical expression runs under
    * `readStream` with no state at all (the CusumStream discipline,
    * minus the state — robust z needs no accumulation).
    */
  def robustFlagsAgainst(events: DataFrame, baseline: DataFrame,
                         k: Double = 3.0,
                         groupCol: String = "event_type",
                         valueCol: String = "value",
                         idCol: String = "event_id"): DataFrame = {
    require(k > 0.0, s"k must be positive, got $k")
    val rz = when(col("__iqr") === 0.0, 0.0)
      .otherwise((col(valueCol) - col("__med")) / col("__iqr"))
    events.join(broadcast(baseline), groupCol)
      .select(col(idCol), col(groupCol), col(valueCol),
        round(rz, 6).as("robust_z"),
        (round(abs(rz) - k, 6) > 0.0).cast("int").as("is_anomaly"))
  }
}
