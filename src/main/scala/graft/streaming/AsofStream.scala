package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of join — the stream twin of
  * [[graft.relational.AsofJoin]] for the purchase-attachment shape
  * (q_asof_purchase): every event row gets the LATEST prior-or-
  * simultaneous purchase value of its user.
  *
  * The batch formulation (union + ordered window) needs a per-key sort
  * of history, which a stream cannot do directly; the streaming
  * formulation replays each key's events in event-time order as the
  * watermark closes over them, carrying the latest right value in
  * per-key state:
  *
  *  - arriving events buffer in the key's state (out-of-order arrival
  *    inside the watermark horizon is absorbed here);
  *  - on every trigger, events with `ts` at or before the current
  *    watermark are processed in (t, event_id) order — purchases at a
  *    timestamp update the carry BEFORE other rows at that timestamp
  *    emit (the batch operator's inclusive-at-equality convention,
  *    with simultaneous purchases reduced by max as the batch query
  *    pre-aggregates) — and emitted exactly once;
  *  - state holds one watermark horizon of buffered events plus a
  *    single carry value per key: bounded by ingest rate × delay,
  *    independent of stream length (the carry never grows).
  *
  * Emitted rows are at-watermark by construction (zero added
  * event-time latency beyond the watermark delay itself).
  */
object AsofStream {

  /** One buffered event. Public: the generated encoder must reach the
    * accessors (a private case class fails Janino compilation).
    */
  final case class AsofEvent(ts: java.sql.Timestamp, user_id: Long,
                             event_id: Long, value: Double,
                             event_type: String)

  final case class AsofOut(user_id: Long, t: Long, event_id: Long,
                           purchase_value: Option[Double])

  /** Per-key state: pending events + the latest closed purchase. */
  final case class AsofState(pending: List[AsofEvent],
                             carry: Option[(Long, Double)])

  /** @param events streaming frame with (ts TIMESTAMP watermarked
    *   upstream or not at all, user_id, event_id, value, event_type)
    * @param delay watermark delay (applied here if the input carries
    *   no watermark yet)
    * @return (user_id, t epoch-micros, event_id, purchase_value) —
    *   null purchase_value when the user has no prior purchase, as in
    *   the batch as-of join
    */
  def asofPurchases(events: DataFrame, delay: String = "1 hour"): Dataset[AsofOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    // normalize columns FIRST, watermark LAST: a cast projected on top
    // of the watermarked column strips its event-time tag, and the
    // event-time timeout below statically requires the tagged column
    val typed = events
      .select(col("ts").cast("timestamp").as("ts"),
        col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        col("value").cast("double").as("value"),
        col("event_type").cast("string").as("event_type"))
      .withWatermark("ts", delay)
      .as[AsofEvent]
    // EventTimeTimeout (available here, unlike the chained near-dedup
    // stages, because the watermarked ts column feeds this operator
    // directly): a key whose traffic stops still flushes its buffered
    // events when the global watermark passes them
    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, rows: Iterator[AsofEvent], st: GroupState[AsofState]) => {
          // batch execution (getCurrentWatermarkMs throws: the
          // optimizer eliminated the watermark node) closes EVERYTHING
          // — the operator then computes the full as-of join, which is
          // what lets the oracle pin the streaming operator's logic
          val (wm, streaming) = try (st.getCurrentWatermarkMs(), true)
          catch { case _: UnsupportedOperationException => (Long.MaxValue, false) }
          // epoch micros, matching the batch query's unix_micros(ts)
          // (Timestamp.getTime is ms; the sub-ms part lives in nanos)
          def micros(t: java.sql.Timestamp): Long =
            t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
          val all = st.getOption.map(_.pending).getOrElse(Nil) ++ rows
          var carry = st.getOption.flatMap(_.carry)
          val (closed, pending) = all.partition(_.ts.getTime <= wm)
          // event-time replay: micros order; at equal time purchases
          // first (inclusive-at-equality), then max value among
          // simultaneous purchases before any row at that time emits
          val out = scala.collection.mutable.ArrayBuffer.empty[AsofOut]
          closed.groupBy(e => micros(e.ts)).toSeq.sortBy(_._1)
            .foreach { case (tUs, evs) =>
              val purchases = evs.filter(_.event_type == "purchase")
              if (purchases.nonEmpty) {
                val v = purchases.map(_.value).max
                carry = Some((tUs, carry match {
                  case Some((ct, cv)) if ct == tUs => math.max(cv, v)
                  case _ => v
                }))
              }
              evs.sortBy(_.event_id).foreach { e =>
                out += AsofOut(user, tUs, e.event_id, carry.map(_._2))
              }
            }
          if (pending.isEmpty && carry.isEmpty) st.remove()
          else {
            st.update(AsofState(pending, carry))
            // wake this key when the watermark reaches its oldest
            // buffered event (all pending are > wm by construction,
            // satisfying the must-be-after-watermark contract); a key
            // holding only a carry needs no wake-up — the carry is
            // read when its next event arrives. Batch mode has no
            // timeouts to register (and nothing pending anyway).
            if (streaming && pending.nonEmpty)
              st.setTimeoutTimestamp(pending.map(_.ts.getTime).min)
          }
          out.iterator
        })
  }
}
