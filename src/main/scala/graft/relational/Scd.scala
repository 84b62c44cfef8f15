package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) snapshot merge — the warehouse
  * CDC primitive a 100 TB ingest pipeline applies when a new extract
  * of a mutable dimension (prices, account states, document metadata)
  * lands against the current snapshot: unchanged rows pass through,
  * changed rows close the old version and open a new one, and keys
  * only present in the update insert a first version.
  *
  * Scale shape: ONE keyed full-outer equi-join between snapshot and
  * update (both sides shuffle-partitioned on the key — AQE handles
  * skew), then pure row-local CASE logic; history explosion is
  * impossible because each input row emits at most two output rows.
  * No window, no driver state.
  */
object Scd {

  /** Merge `updates` (one row per key, observed at `updSeq`) into
    * `base` (one row per key, valid since `baseSeq`).
    *
    * Output: key, one column per tracked attribute, `valid_from`,
    * `valid_to` (null while current), `is_current` (1/0). Rows:
    *  - key only in base, or tracked values equal → one current row
    *    with the base values (valid_from = baseSeq);
    *  - key in both with any tracked value differing → the closed
    *    base row (valid_to = updSeq) plus a current update row;
    *  - key only in updates → one current row (valid_from = updSeq).
    *
    * Null-safe comparison: a null tracked value equals only null (the
    * `<=>` semantics), so null→value transitions version correctly.
    */
  def scd2Merge(base: DataFrame, updates: DataFrame, key: String,
                tracked: Seq[String], baseSeq: Long, updSeq: Long): DataFrame = {
    require(tracked.nonEmpty, "need at least one tracked column")
    // presence markers ride on the join inputs (not tracked-value
    // nullness), so a row whose every tracked value is null still
    // counts as present on its side — and the merge stays ONE join
    val b = base.select(col(key) +: tracked.map(c => col(c).as(s"b_$c"))
      :+ lit(1).as("__in_b"): _*)
    val u = updates.select(col(key) +: tracked.map(c => col(c).as(s"u_$c"))
      :+ lit(1).as("__in_u"): _*)
    val withPresence = b.join(u, Seq(key), "full_outer")
    val changed = tracked
      .map(c => !(col(s"b_$c") <=> col(s"u_$c")))
      .reduce(_ || _)
    val isChange = col("__in_b").isNotNull && col("__in_u").isNotNull && changed
    // both output rows come from ONE pass over the join (array +
    // explode), not a two-branch union that would re-run the join
    val closedRow = when(isChange, struct(
      tracked.map(c => col(s"b_$c").as(c)) :+
        lit(baseSeq).as("valid_from") :+
        lit(updSeq).cast("long").as("valid_to") :+
        lit(0).as("is_current"): _*))
    val currentRow = struct(
      tracked.map(c => when(isChange || col("__in_b").isNull, col(s"u_$c"))
        .otherwise(col(s"b_$c")).as(c)) :+
        when(isChange || col("__in_b").isNull, lit(updSeq))
          .otherwise(lit(baseSeq)).as("valid_from") :+
        lit(null).cast("long").as("valid_to") :+
        lit(1).as("is_current"): _*)
    withPresence
      .select(col(key), explode(array(closedRow, currentRow)).as("__r"))
      .filter(col("__r").isNotNull)
      .select(col(key) +: (tracked :+ "valid_from" :+ "valid_to" :+ "is_current")
        .map(c => col(s"__r.$c")): _*)
  }

  /** Snapshot diff between two versions of a keyed table — the
    * data-ops "what changed between yesterday's extract and today's"
    * audit, reduced to one row of counts: keys added, removed,
    * value-changed, and unchanged.
    *
    * Change detection hashes the tracked value columns per row
    * (md5 over a 0x01-joined string rendering) — each engine
    * compares its OWN renderings of both versions, so the counts are
    * engine-exact even where float-to-string formats differ across
    * engines. NULLs are encoded EXPLICITLY (a 0x00-prefixed sentinel
    * per column) because concat_ws silently skips NULL operands: the
    * raw rendering would hash (x, NULL) and (NULL, x) identically and
    * count a value-position swap as 'unchanged'. One keyed full-outer
    * join + a 1-row aggregate; no window, no collect. NULL KEYS never
    * match across the join (SQL equality), so a NULL-keyed row counts
    * once removed and once added — both engines agree.
    *
    * @return one row (n_before, n_after, added, removed, changed,
    *   unchanged)
    */
  def snapshotDiff(before: DataFrame, after: DataFrame,
                   keyCols: Seq[String], valueCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && valueCols.nonEmpty,
      "need key and value columns")
    def hashed(df: DataFrame, h: String) =
      df.select(keyCols.map(col) :+
        md5(concat_ws("\u0001", valueCols.map(c =>
          coalesce(col(c).cast("string"), lit("\u0000NULL"))): _*))
          .as(h): _*)
    hashed(before, "__hb").join(hashed(after, "__ha"), keyCols, "full")
      .agg(count(col("__hb")).as("n_before"),
        count(col("__ha")).as("n_after"),
        sum(when(col("__hb").isNull, 1L).otherwise(0L)).as("added"),
        sum(when(col("__ha").isNull, 1L).otherwise(0L)).as("removed"),
        sum(when(col("__hb").isNotNull && col("__ha").isNotNull &&
          col("__hb") =!= col("__ha"), 1L).otherwise(0L)).as("changed"),
        sum(when(col("__hb") === col("__ha"), 1L).otherwise(0L))
          .as("unchanged"))
  }

  /** Type-1 CDC apply — collapse an insert/update/delete change log to
    * the latest state per key: the other half of the warehouse ingest
    * story ([[scd2Merge]] keeps history; this materializes "now").
    *
    * `log` carries `keyCol`, a strictly increasing per-key `seqCol`,
    * an `opCol` in {I, U, D}, and the value columns. The winner per
    * key is the row with the highest sequence; keys whose winning op
    * is D vanish from the output.
    *
    * Scale shape: ONE `max_by(struct(values), seq)` hash aggregate —
    * map-side combinable (each mapper keeps one candidate per key
    * before the shuffle), so the shuffle volume is bounded by distinct
    * keys, not log length. No window, no driver state: the 100 TB
    * change-log compaction shape. Replayed / duplicated log entries
    * (at-least-once ingest) are harmless: the same (key, seq) winner
    * wins again.
    */
  def cdcApply(log: DataFrame, keyCol: String, seqCol: String,
               opCol: String, valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "need at least one value column")
    val payload = struct(
      (opCol +: valueCols :+ seqCol).map(col): _*)
    log.groupBy(col(keyCol))
      .agg(max_by(payload, col(seqCol)).as("__w"))
      .filter(col(s"__w.$opCol") =!= "D")
      .select(col(keyCol) +:
        valueCols.map(c => col(s"__w.$c").as(c)) :+
        col(s"__w.$seqCol").as(seqCol): _*)
  }
}
