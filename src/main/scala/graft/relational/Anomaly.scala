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
    robustFlagsAgainst(events, fitBaseline(events, groupCol, valueCol, idCol),
      k, groupCol, valueCol, idCol)

  /** The per-group median/IQR baseline fit — (groupCol, __med, __iqr).
    *
    * NOT Spark's exact `percentile` aggregate (r13): that buffers every
    * value of a group inside ONE aggregator, and the registered query
    * fits over the full event stream keyed by event_type — at 100 TB
    * that is billions of doubles in one buffer (the exact hazard
    * Profile.scala documents). Instead the three quantiles ride the
    * range-partitioned exact-rank machinery: one
    * [[graft.ops.Ranking.groupedCumsum]] of ones over the
    * (group, value, id) total order gives every row its within-group
    * sorted position with two bounded shuffles and NO per-group task;
    * a per-group count (map-side combinable, k-bounded output —
    * event types, not events) broadcasts the three target positions
    * `idx = p·(n−1)` back; the ≤6 surviving rows per group reduce to
    * `v_lo + (v_hi − v_lo)·frac` — equal WITHIN 1 ULP to Spark's
    * `percentile` (which uses the weighted form
    * `(hiIdx−pos)·lo + (pos−loIdx)·hi`) and to DuckDB's quantile_cont
    * (ADVICE r13: all three formulas can differ in the last float bit
    * when frac ∈ {.25,.75}; the 1e-6 output rounding absorbs that
    * absent boundary ties, and p ∈ {.25,.5,.75} are exact dyadics so
    * idx/frac themselves are exact and the SELECTED values are raw
    * data values).
    *
    * Groups whose values are ALL null keep a (null med, null iqr) row,
    * matching the old aggregate's output shape. EAGER by contract:
    * the exact global order's checkpoint runs jobs at call time
    * (Ranking.globalCumsum scaladoc) — a baseline FIT, not a lazy
    * stream stage.
    */
  def fitBaseline(events: DataFrame,
                  groupCol: String = "event_type",
                  valueCol: String = "value",
                  idCol: String = "event_id"): DataFrame = {
    val g = col(groupCol)
    val nn = events.filter(col(valueCol).isNotNull)
      .select(g, col(valueCol), col(idCol))
    val ranked = graft.ops.Ranking.groupedCumsum(
      nn.withColumn("__one", lit(1L)), groupCol,
      Seq(col(valueCol), col(idCol)), "__one", "__pos")
    // all groups (null-only ones included) with their non-null counts
    val counts = events.groupBy(g).agg(count(col(valueCol)).as("__n"))
    val targets = counts.filter(col("__n") > 0)
      .select(g.as("__g"), col("__n"),
        explode(array(lit(0.25), lit(0.5), lit(0.75))).as("__p"))
      .withColumn("__idx", col("__p") * (col("__n") - 1).cast("double"))
      .withColumn("__lo", floor(col("__idx")).cast("long") + 1)
      .withColumn("__hi", ceil(col("__idx")).cast("long") + 1)
      .withColumn("__frac", col("__idx") - floor(col("__idx")))
      .drop("__n", "__idx")
    val picked = ranked.join(broadcast(targets),
      g === col("__g") &&
        (col("__pos") === col("__lo") || col("__pos") === col("__hi")))
    val quants = picked.groupBy(col("__g"), col("__p")).agg(
      (max(when(col("__pos") === col("__lo"), col(valueCol))) +
        (max(when(col("__pos") === col("__hi"), col(valueCol))) -
          max(when(col("__pos") === col("__lo"), col(valueCol)))) *
          max(col("__frac"))).as("__q"))
    val wide = quants.groupBy(col("__g")).agg(
      max(when(col("__p") === 0.5, col("__q"))).as("__med"),
      (max(when(col("__p") === 0.75, col("__q"))) -
        max(when(col("__p") === 0.25, col("__q")))).as("__iqr"))
    counts.select(g)
      .join(wide.withColumnRenamed("__g", groupCol), Seq(groupCol), "left")
  }

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
