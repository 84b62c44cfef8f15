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
  * Determinism mirrors the batch fix exactly — integer fixed-point
  * end to end (`Σx − n·μ` is a catastrophic cancellation, so even a
  * sequential float accumulation leaks the inputs' cross-engine ULP
  * noise into the 1e-6-rounded output): each value is fixed to a
  * 1e-9-unit long on arrival, the baseline carries μ fixed to the
  * same grid (`mu9`), and the state carries a LONG Σ — the running
  * statistic is exact integer arithmetic until the final divide back
  * to double. The breach decision is the batch operator's r13
  * integer certificate symbol for symbol: the baseline carries the
  * exact `ex = N·Σv9² − (Σv9)²` (as a decimal STRING — it exceeds
  * long range, and the default BigDecimal encoder's (38,18) cannot
  * hold it) plus the fit count N, and scoring compares
  * `(N·(|cs9| − 500))²·d ≥ u·ex` in BigInteger — no float, no sqrt,
  * no σ anywhere in the flag.
  */
object CusumStream {

  case class ScoredRow(unit_id: Long, month_id: Long, value: Double,
                       mu9: Long, nb: Long, ex: String)
  case class CusumState(n: Long, s9: Long)
  case class CusumOut(unit_id: Long, month_id: Long, cusum: Double,
                      breach: Int)

  /** Per-unit reference stats, the batch fit: (unit_id, mu9, nb, ex)
    * with μ fixed to the 1e-9 integer grid from the exact integer
    * value total and `ex` the exact integer N²σ9² —
    * TemporalOps.cusum's discipline, symbol for symbol.
    */
  def fitBaseline(panel: DataFrame, valueCol: String = "value"): DataFrame = {
    val v9 = round(col(valueCol) * lit(1e9)).cast("long")
    val v9d = v9.cast("decimal(19,0)")
    panel.groupBy(col(graft.Panel.UnitCol))
      .agg(round(sum(v9).cast("double") / count(v9).cast("double"))
             .cast("long").as("mu9"),
        count(v9).as("nb"),
        (count(v9).cast("decimal(19,0)") * sum(v9d * v9d) -
          sum(v9).cast("decimal(19,0)") * sum(v9).cast("decimal(19,0)"))
          .cast("string").as("ex"))
  }

  /** `round(value·1e9)` exactly as Spark's `round()` computes it:
    * BigDecimal HALF_UP on the double's shortest decimal rendering —
    * the streaming scan-side fix must quantize to the identical grid
    * as the batch plan's Round expression.
    */
  def fix9(value: Double): Long =
    BigDecimal(value * 1e9).setScale(0, BigDecimal.RoundingMode.HALF_UP)
      .toLong

  private def breachOf(cs9: Long, nb: Long, ex: String, h: Double): Int = {
    // the batch side's integer certificate: A = |cs9| − 500,
    // breach ⟺ A ≥ 0 AND (A·N)²·d ≥ u·ex with h² = u/d exact
    val a = math.abs(cs9) - 500L
    if (a < 0L) 0
    else {
      val (u, d) = graft.ops.TemporalOps.cusumRational(h)
      val an = BigInt(a) * BigInt(nb)
      if (BigDecimal(an * an) * d >= u * BigDecimal(BigInt(ex))) 1 else 0
    }
  }

  def updateGroup(h: Double)(unit: Long, rows: Iterator[ScoredRow],
                             state: GroupState[CusumState]): Iterator[CusumOut] = {
    var st = state.getOption.getOrElse(CusumState(0L, 0L))
    val out = rows.toSeq.sortBy(_.month_id).map { r =>
      st = CusumState(st.n + 1, st.s9 + fix9(r.value))
      val cs9 = st.s9 - st.n * r.mu9
      CusumOut(unit, r.month_id, cs9.toDouble / 1e9,
        breachOf(cs9, r.nb, r.ex, h))
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
        col("value"), col("mu9"), col("nb"), col("ex"))
      .as[ScoredRow], h)
  }
}
