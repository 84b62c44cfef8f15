package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CUSUM drift detection — the incremental twin of
  * [[graft.ops.TemporalOps.cusum]], which is inherently a monitoring
  * (streaming) use case: watch each unit's series as it arrives and
  * flag when the cumulative deviation from a FITTED baseline crosses
  * h·σ.
  *
  * The baseline (per-unit μ, σ) is an input, not derived from the
  * stream: a drift monitor scores against reference statistics fitted
  * on a training window — the batch operator's full-series mean IS
  * that reference when the twin replays the same panel, which is what
  * lets one DuckDB oracle pin both. Stats ride a broadcast join onto
  * the stream (static side, streaming-safe); per-unit state is just
  * (n, Σx) — O(1) per row, the TickStream discipline.
  *
  * Determinism mirrors the batch fix exactly: the statistic is
  * `Σx − n·μ` with μ pre-rounded to 1e-9 by the fitter, and Σx
  * accumulates in month order — no partition-layout float noise.
  */
object CusumStream {

  case class ScoredRow(unit_id: Long, month_id: Long, value: Double,
                       mu: Double, sd: Double)
  case class CusumState(n: Long, s: Double)
  case class CusumOut(unit_id: Long, month_id: Long, cusum: Double,
                      breach: Int)

  /** Per-unit reference stats, the batch fit: (unit_id, mu, sd) with
    * the 1e-9 rounding that makes downstream accumulation
    * partitioning-invariant (TemporalOps.cusum's discipline).
    */
  def fitBaseline(panel: DataFrame, valueCol: String = "value"): DataFrame =
    panel.groupBy(col(graft.Panel.UnitCol))
      .agg(round(avg(col(valueCol)), 9).as("mu"),
        round(stddev_pop(col(valueCol)), 9).as("sd"))

  private def breachOf(cs: Double, sd: Double, h: Double): Int = {
    // the batch side's round(|cs| − h·σ, 6) > 0 — BigDecimal HALF_UP
    // is exactly Spark's round()
    val margin = BigDecimal(math.abs(cs) - h * sd)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    if (margin > 0) 1 else 0
  }

  def updateGroup(h: Double)(unit: Long, rows: Iterator[ScoredRow],
                             state: GroupState[CusumState]): Iterator[CusumOut] = {
    var st = state.getOption.getOrElse(CusumState(0L, 0.0))
    val out = rows.toSeq.sortBy(_.month_id).map { r =>
      st = CusumState(st.n + 1, st.s + r.value)
      val cs = st.s - st.n * r.mu
      CusumOut(unit, r.month_id, cs, breachOf(cs, r.sd, h))
    }
    state.update(st)
    out.iterator
  }

  /** Batch or streaming: per-unit running CUSUM + breach flag against
    * the supplied baseline. On a stream, feed in-order per-unit
    * micro-batches (the state carries (n, Σx) across batches); in
    * batch mode the group iterator sees the whole series and the
    * result equals [[graft.ops.TemporalOps.cusum]] row for row.
    */
  def cusum(scored: Dataset[ScoredRow], h: Double = 3.0): Dataset[CusumOut] = {
    val spark = scored.sparkSession
    import spark.implicits._
    scored.groupByKey(_.unit_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(updateGroup(h))
  }

  /** Convenience: join the baseline onto a (unit, month, value) frame
    * and score it — the shape the wire registration uses.
    */
  def scoreAgainst(panel: DataFrame, baseline: DataFrame,
                   h: Double = 3.0): Dataset[CusumOut] = {
    val spark = panel.sparkSession
    import spark.implicits._
    cusum(panel
      .join(broadcast(baseline), graft.Panel.UnitCol)
      .select(col(graft.Panel.UnitCol), col(graft.Panel.TimeCol),
        col("value"), col("mu"), col("sd"))
      .as[ScoredRow], h)
  }
}
