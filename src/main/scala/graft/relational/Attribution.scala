package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Last-touch conversion attribution: each purchase credits the user's
  * latest PRIOR non-purchase event (the classic marketing attribution
  * query, and a natural consumer of the as-of machinery — the
  * touchpoint lookup IS a backward as-of join, so it inherits that
  * operator's no-join-node union+window plan instead of a per-user
  * range product).
  *
  * Touchpoints are made unique per (user, time) before the join (the
  * as-of contract): ties at one timestamp resolve to the largest
  * event_id via max_by — deterministic in any engine.
  */
object Attribution {

  /** @return one row per conversion:
    * (user_id, t, event_id, touch_type, touch_event_id) —
    * touch_* NULL when nothing preceded the conversion.
    */
  def lastTouch(events: DataFrame, conversionType: String = "purchase",
                userCol: String = "user_id", typeCol: String = "event_type",
                tsCol: String = "ts"): DataFrame = {
    val ev = events.select(col(userCol), unix_micros(col(tsCol)).as("t"),
      col("event_id"), col(typeCol))
    val conversions = ev.filter(col(typeCol) === conversionType)
      .select(col(userCol), col("t"), col("event_id"))
    val touches = ev.filter(col(typeCol) =!= conversionType)
      .groupBy(col(userCol), col("t"))
      .agg(expr(s"max_by(`${typeCol.replace("`", "``")}`, event_id)")
        .as("touch_type"),
        max(col("event_id")).as("touch_event_id"))
    AsofJoin.asofJoin(conversions, touches, userCol, "t",
      Seq("touch_type", "touch_event_id"))
  }
}
