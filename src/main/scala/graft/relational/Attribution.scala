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

  /** Multi-touch attribution — every touch before a conversion gets a
    * CREDIT share instead of winner-takes-all [[lastTouch]]. Each
    * non-conversion event is assigned to the user's EARLIEST conversion
    * at or after it (the forward mirror of the last-touch as-of);
    * within a conversion's touch path of length n the row carries both
    * standard models:
    *
    *   - linear:   1/n to every touch
    *   - position (U-shaped): n=1 → 1.0; n=2 → 0.5 each;
    *     n≥3 → 0.4 first, 0.4 last, 0.2/(n−2) to each middle
    *
    * Scale shape: conversion assignment is ONE min-over-following
    * window on the user partitioning (no join — the as-of discipline),
    * and path length / position are one more window pass on (user,
    * conversion). Touch paths are per-user bounded; nothing leaves the
    * user partitioning until the final projection. Credits are ratios
    * of small exact integers — IEEE-identical in any engine — rounded
    * 1e-6 on output.
    *
    * @return one row per attributed touch: (user_id, conv_t,
    *         conv_event_id, touch_event_id, touch_type, n_touches,
    *         position, credit_linear, credit_position)
    */
  def multiTouch(events: DataFrame, conversionType: String = "purchase",
                 userCol: String = "user_id", typeCol: String = "event_type",
                 tsCol: String = "ts"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = events.select(col(userCol), unix_micros(col(tsCol)).as("t"),
      col("event_id"), col(typeCol))
    val isConv = col(typeCol) === conversionType
    // earliest conversion at-or-after each row, as a (t, event_id)
    // struct min over the following frame — deterministic total order
    val wFwd = Window.partitionBy(col(userCol))
      .orderBy(col("t"), col("event_id"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val assigned = ev
      .withColumn("__conv",
        min(when(isConv, struct(col("t"), col("event_id")))).over(wFwd))
      .filter(!isConv && col("__conv").isNotNull)
      .select(col(userCol), col("t"), col("__conv.t").as("conv_t"),
        col("__conv.event_id").as("conv_event_id"),
        col("event_id").as("touch_event_id"),
        col(typeCol).as("touch_type"))
    val wPath = Window.partitionBy(col(userCol), col("conv_event_id"))
    val wPos = wPath.orderBy(col("t"), col("touch_event_id"))
    val n = col("n_touches").cast("double")
    val pos = col("position")
    val position = when(col("n_touches") <= 2,
        lit(1.0) / n)
      .when(pos === 1 || pos === col("n_touches"), lit(0.4))
      .otherwise(lit(0.2) / (n - 2.0))
    assigned
      .withColumn("n_touches", count(lit(1)).over(wPath))
      .withColumn("position", row_number().over(wPos).cast("long"))
      .select(col(userCol), col("conv_t"), col("conv_event_id"),
        col("touch_event_id"), col("touch_type"), col("n_touches"),
        col("position"),
        round(lit(1.0) / n, 6).as("credit_linear"),
        round(position, 6).as("credit_position"))
  }

  /** Time-decay attribution — the third classic credit model next to
    * [[multiTouch]]'s linear and U-shaped splits: each touch earns
    * weight 2^(−Δt/halflife) by its distance from the conversion, and
    * credits normalize per conversion. Same no-join struct-min
    * assignment; the per-conversion normalizer sums the weights as
    * exact 1e-9-fixed integers (bounded by that conversion's touch
    * count), so the rounded credits are layout-proof — the raw pow()
    * is row-local.
    *
    * @return (user_id, conv_event_id, touch_event_id, touch_type,
    *         age_sec, credit_decay)
    */
  def timeDecay(events: DataFrame, halflifeSec: Double = 7.0 * 86400.0,
                conversionType: String = "purchase",
                userCol: String = "user_id", typeCol: String = "event_type",
                tsCol: String = "ts"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(halflifeSec > 0.0, s"halflife must be positive, got $halflifeSec")
    val ev = events.select(col(userCol), unix_micros(col(tsCol)).as("t"),
      col("event_id"), col(typeCol))
    val isConv = col(typeCol) === conversionType
    val wFwd = Window.partitionBy(col(userCol))
      .orderBy(col("t"), col("event_id"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val assigned = ev
      .withColumn("__conv",
        min(when(isConv, struct(col("t"), col("event_id")))).over(wFwd))
      .filter(!isConv && col("__conv").isNotNull)
      .select(col(userCol), col("t"),
        col("__conv.event_id").as("conv_event_id"),
        col("event_id").as("touch_event_id"),
        col(typeCol).as("touch_type"),
        ((col("__conv.t") - col("t")).cast("double") / 1e6).as("age_sec"))
    val w9 = round(pow(lit(2.0), -col("age_sec") / halflifeSec) * 1e9)
      .cast("long")
    val wConv = Window.partitionBy(col(userCol), col("conv_event_id"))
    assigned
      .withColumn("__w9", w9)
      .withColumn("__tot", sum(col("__w9")).over(wConv))
      .select(col(userCol), col("conv_event_id"), col("touch_event_id"),
        col("touch_type"), round(col("age_sec"), 6).as("age_sec"),
        round(col("__w9").cast("double") / col("__tot"), 6)
          .as("credit_decay"))
  }

  /** Time-to-convert per conversion — how long the touch path ran
    * before the purchase: the latency distribution a growth readout
    * reports next to the credit split. Same no-join assignment as
    * [[multiTouch]] (struct-min over the following user frame), then
    * ONE (user, conversion) aggregate: path length, first/last touch
    * times, and the first-touch→conversion latency in seconds.
    *
    * @return (user_id, conv_event_id, conv_t, n_touches,
    *         latency_sec) — one row per conversion that HAS touches
    */
  def conversionLatency(events: DataFrame,
                        conversionType: String = "purchase",
                        userCol: String = "user_id",
                        typeCol: String = "event_type",
                        tsCol: String = "ts"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = events.select(col(userCol), unix_micros(col(tsCol)).as("t"),
      col("event_id"), col(typeCol))
    val isConv = col(typeCol) === conversionType
    val wFwd = Window.partitionBy(col(userCol))
      .orderBy(col("t"), col("event_id"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    ev.withColumn("__conv",
        min(when(isConv, struct(col("t"), col("event_id")))).over(wFwd))
      .filter(!isConv && col("__conv").isNotNull)
      .groupBy(col(userCol), col("__conv.event_id").as("conv_event_id"))
      .agg(min(col("__conv.t")).as("conv_t"),
        count(lit(1)).as("n_touches"),
        round((min(col("__conv.t")) - min(col("t"))).cast("double")
          / 1000000.0, 6).as("latency_sec"))
      .select(col(userCol), col("conv_event_id"), col("conv_t"),
        col("n_touches"), col("latency_sec"))
  }
}
