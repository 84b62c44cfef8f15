package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event sessionization — the training-data op that turns a raw event
  * log into per-user interaction sessions (conversation building,
  * session-level feature extraction, engagement labelling).
  *
  * Built on Spark's native `session_window`: per (user, session) the
  * window is `[min ts, last ts + gap)`, and two events share a session
  * iff they are chained by gaps of at most `gapSeconds` (the merge is
  * boundary-INCLUSIVE: a new session starts only when
  * `ts - prev_ts > gap`). Using the native
  * operator (rather than a hand-rolled lag/cumsum islands window) buys
  * the streaming path for free: the identical expression runs under
  * `readStream` + `withWatermark`, where Spark maintains and MERGES
  * per-key session state and evicts closed sessions past the
  * watermark — state size is bounded by OPEN sessions, not history.
  *
  * Scale shape: one shuffle on the session-grouping key; all
  * aggregates are partial (map-side) before the merge. Timestamps are
  * emitted as epoch microseconds (BIGINT) so results are
  * engine-neutral.
  */
object Sessions {

  /** Per-(user, session) aggregate of an event log.
    *
    * @return (user_id, t_start_us, t_end_us, n_events, sum_value) —
    *   t_end_us is the session-window close, i.e. last event + gap.
    */
  def sessionize(events: DataFrame, gapSeconds: Long): DataFrame =
    events
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapSeconds seconds").as("sw"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("t_start_us"),
        unix_micros(col("sw.end")).as("t_end_us"),
        col("n_events"), col("sum_value"))
}
