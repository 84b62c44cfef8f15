package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming cohort retention — the incremental twin of
  * [[graft.relational.Funnel.retention]]: per-user state is the cohort
  * period (first period observed) plus the set of offsets already
  * emitted, so each (user, offset) cell leaves the operator EXACTLY
  * once however many events land in that period — append-mode-safe
  * increments a downstream count turns into the retention matrix.
  * State is one long + the distinct-offset set (bounded by the product
  * horizon in periods, not by event volume).
  *
  * Feed in-order per-user micro-batches (the watermark-replay
  * discipline): the cohort anchor is the first period SEEN, which
  * equals the true minimum under ordered delivery — and in batch mode
  * trivially, since the whole history sorts inside one group, making a
  * batch replay equal [[graft.relational.Funnel.retention]] row for
  * row (one oracle pins both).
  */
object RetentionStream {

  case class Ev(user_id: Long, w: Long)
  case class RetState(cohort: Long, seen: Seq[Long])
  case class Cell(user_id: Long, cohort_period: Long, period_offset: Long)

  def updateGroup(user: Long, rows: Iterator[Ev],
                  state: GroupState[RetState]): Iterator[Cell] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Cell]
    var st = state.getOption
    rows.toSeq.sortBy(_.w).foreach { e =>
      st match {
        case None =>
          st = Some(RetState(e.w, Seq(0L)))
          out += Cell(user, e.w, 0L)
        case Some(s) =>
          val off = e.w - s.cohort
          if (off >= 0 && !s.seen.contains(off)) {
            st = Some(s.copy(seen = s.seen :+ off))
            out += Cell(user, s.cohort, off)
          }
      }
    }
    st.foreach(state.update)
    out.iterator
  }

  /** Exactly-once (user, cohort, offset) cell stream. */
  def retentionCells(events: DataFrame, periodSec: Long = 7L * 86400L,
                     userCol: String = "user_id",
                     tsCol: String = "ts"): Dataset[Cell] = {
    require(periodSec > 0, s"periodSec must be positive, got $periodSec")
    val spark = events.sparkSession
    import spark.implicits._
    val perMicros = periodSec * 1000000L
    events
      .select(col(userCol).cast("long").as("user_id"),
        expr(s"unix_micros(`${tsCol.replace("`", "``")}`) div ${perMicros}L")
          .as("w"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(updateGroup)
  }

  /** The retention matrix from the cell stream — in batch mode
    * identical to [[graft.relational.Funnel.retention]].
    */
  def retentionReport(events: DataFrame, periodSec: Long = 7L * 86400L,
                      userCol: String = "user_id",
                      tsCol: String = "ts"): DataFrame =
    retentionCells(events, periodSec, userCol, tsCol).toDF()
      .groupBy(col("cohort_period"), col("period_offset"))
      .agg(count(lit(1)).as("n_users"))
}
