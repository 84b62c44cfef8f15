package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming tick_time_since — the reference's one incremental operator
  * (views_2.py:385-418): per unit, the time-since counter advances O(1)
  * per new timestep — 0 if the previous step carried an event, else
  * previous counter + 1.
  *
  * Structured-Streaming formulation: `flatMapGroupsWithState` keyed by
  * unit, state = (last event value, last counter). Works identically on
  * a batch Dataset (rows sorted per unit inside the group iterator) and
  * on a stream of in-order per-unit micro-batches — the state layout is
  * what a production watermark-driven job would checkpoint.
  */
object TickStream {

  case class PanelRow(unit_id: Long, month_id: Long, value: Double)
  case class TickState(lastEvent: Double, lastTick: Option[Double])
  case class TickOut(unit_id: Long, month_id: Long, tick: Option[Double])

  def updateGroup(unit: Long, rows: Iterator[PanelRow],
                  state: GroupState[TickState]): Iterator[TickOut] = {
    var st = state.getOption.getOrElse(TickState(Double.NaN, None))
    val out = rows.toSeq.sortBy(_.month_id).map { r =>
      val tick: Option[Double] =
        if (st.lastEvent.isNaN) None // no prior step yet (reference lag -> NaN)
        else if (st.lastEvent != 0.0) Some(0.0)
        else Some(st.lastTick.getOrElse(0.0) + 1.0)
      st = TickState(r.value, tick.orElse(Some(0.0)))
      TickOut(unit, r.month_id, tick)
    }
    state.update(st)
    out.iterator
  }

  /** Batch or streaming: ticks for every row after each unit's first. */
  def tickTimeSince(panel: Dataset[PanelRow]): Dataset[TickOut] = {
    val spark = panel.sparkSession
    import spark.implicits._
    panel.groupByKey(_.unit_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(updateGroup)
  }
}
