package graft.spatial

import graft.Panel
import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Spacetime k-nearest-event distances — reference
  * get_spacetime_distances (spacetime_distance.py:7-211): for every
  * (cell, month), find the k nearest past-or-present events (cells with
  * value > threshold; reference uses > 0, spacetime_distance.py:132) in
  * the metric sqrt((0.5·Δlon)² + (0.5·Δlat)² + (nu·Δt)²) (cell→degree
  * scaling PGID_TO_DEGREES = 0.5, time stretched by nu), returning the
  * mean distance or the mean event weight `size/d^power` (size itself
  * when d = 0). Cells with no events yet get the 999.0 sentinel
  * (spacetime_distance.py:151).
  *
  * Spark-first plan, tuned for scale:
  *  - The as-of predicate `event.month <= cell.month` becomes an
  *    EQUI-join: events are expanded over a broadcast (month, e_month)
  *    pair table (months are few; events are sparse), so the big join is
  *    a codegen'd BroadcastHashJoin on month_id — never a nested-loop
  *    range join.
  *  - k = 1 reduces by `min` / `min(struct(...))` (argmin with the same
  *    deterministic tie-break) — partial aggregation runs map-side, so
  *    only one row per (month, cell) crosses the shuffle.
  *  - k > 1 uses a bounded top-k Aggregator (size-k sorted buffer,
  *    merged associatively) — the same map-side reduction, k rows per
  *    cell instead of every candidate through a sort.
  *  - Ties in distance break by (event month, event unit); the
  *    reference's KD-tree tie order is arbitrary, so determinism is our
  *    choice.
  */
object SpacetimeDist {

  type Cand = (Double, Long, Long, Double) // (d, e_t, e_u, e_size)

  /** Bounded top-k by (d, e_t, e_u): keeps at most k candidates through
    * partial/merge aggregation.
    */
  class TopK(k: Int) extends Aggregator[Cand, Seq[Cand], Seq[Cand]] {
    private val ord = Ordering.by[Cand, (Double, Long, Long)](c => (c._1, c._2, c._3))
    override def zero: Seq[Cand] = Seq.empty
    override def reduce(b: Seq[Cand], a: Cand): Seq[Cand] =
      // O(1) rejection once the buffer is full — the overwhelmingly
      // common case; inserts happen only ~k·H(n) times per group
      if (b.length >= k && ord.compare(a, b.last) >= 0) b
      else (b :+ a).sorted(ord).take(k)
    override def merge(a: Seq[Cand], b: Seq[Cand]): Seq[Cand] =
      (a ++ b).sorted(ord).take(k)
    override def finish(r: Seq[Cand]): Seq[Cand] = r
    override def bufferEncoder: Encoder[Seq[Cand]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Cand]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** @param monthCap compat quirk: the reference processes only the
    * first 600 months (`times[0:600]`, spacetime_distance.py:127);
    * pass Some(600) to replicate (months beyond the cap keep their
    * rows but are never computed — they get the 999.0 sentinel).
    */
  def spacetimeDistances(panel: DataFrame, valueCol: String,
                         returnValues: String, k: Int, nu: Double, power: Double,
                         eventThreshold: Double = 0.0,
                         lonCol: String = "lon", latCol: String = "lat",
                         out: String = "stdist",
                         monthCap: Option[Int] = None): DataFrame = {
    val T = Panel.TimeCol
    val U = Panel.UnitCol
    require(returnValues == "distances" || returnValues == "weights",
      s"return_values must be 'distances' or 'weights', got $returnValues")

    val allMonths = panel.select(col(T)).distinct()
    val months = monthCap match {
      case Some(cap) => allMonths.orderBy(col(T)).limit(cap)
      case None => allMonths
    }

    val events = panel.filter(col(valueCol) > eventThreshold)
      .select(col(T).as("e_t"), col(lonCol).as("e_lon"),
        col(latCol).as("e_lat"), col(valueCol).as("e_size"), col(U).as("e_u"))
    val monthPairs = months.select(col(T))
      .crossJoin(months.select(col(T).as("e_t")))
      .filter(col("e_t") <= col(T))
    val visible = broadcast(events.join(broadcast(monthPairs), "e_t"))

    // work in SQUARED distance through the hot path: d² orders
    // identically to d (monotone), needs only multiplications (Spark's
    // pow is StrictMath.pow — an order of magnitude slower than x*x),
    // and sqrt/pow run only on the ~k rows per cell that survive
    // aggregation. d^power = (d²)^(power/2) exactly.
    val dx = (col(lonCol) - col("e_lon")) * 0.5
    val dy = (col(latCol) - col("e_lat")) * 0.5
    val dt = (col(T) - col("e_t")) * nu
    val cells = panel.select(col(T), col(U), col(lonCol), col(latCol))
    val pairs = cells.join(visible, T)
      .withColumn("d2", dx * dx + dy * dy + dt * dt)

    def weightOf2(d2: org.apache.spark.sql.Column, size: org.apache.spark.sql.Column) =
      when(d2 === 0.0, size).otherwise(size / pow(d2, power / 2.0))

    val agg: DataFrame =
      if (k == 1) {
        if (returnValues == "distances")
          pairs.groupBy(col(T), col(U)).agg(sqrt(min(col("d2"))).as(out))
        else {
          // two-pass argmin: a plain double min stays in whole-stage
          // codegen'd HashAggregate (min over a struct would sort-
          // aggregate every candidate row); the re-join on the exact
          // minimum then touches ~one row per cell, where the
          // (e_t, e_u) tie-break is a trivially small struct-min
          val md = pairs.groupBy(col(T), col(U)).agg(min(col("d2")).as("md2"))
          // md is one row per (month, cell) — broadcast it so the big
          // candidate side never shuffles
          val ties = pairs.join(broadcast(md), Seq(T, U)).filter(col("d2") === col("md2"))
          ties.groupBy(col(T), col(U), col("md2"))
            .agg(min(struct(col("e_t"), col("e_u"), col("e_size"))).as("b"))
            .select(col(T), col(U), weightOf2(col("md2"), col("b.e_size")).as(out))
        }
      } else {
        val spark = panel.sparkSession
        // The bounded-buffer aggregate lives in ObjectHashAggregate,
        // whose default sort-based fallback kicks in at 128 groups —
        // far below a panel's (month, cell) cardinality. Raise the
        // threshold only if the session still has the default, so we
        // never clobber an operator-external tuning choice; sessions
        // built by Bench/Verify set it explicitly.
        val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
        if (spark.conf.getOption(key).forall(_ == "128"))
          spark.conf.set(key, "4000000")
        val topk = udaf(new TopK(k))
        val grouped = pairs.groupBy(col(T), col(U))
          .agg(topk(col("d2"), col("e_t"), col("e_u"), col("e_size")).as("cands"))
        val c = explode(col("cands")).as("c")
        val per = grouped.select(col(T), col(U), c)
          .select(col(T), col(U), col("c._1").as("d2"), col("c._4").as("e_size"))
        val perEvent = if (returnValues == "distances") sqrt(col("d2"))
                       else weightOf2(col("d2"), col("e_size"))
        per.groupBy(col(T), col(U)).agg(avg(perEvent).as(out))
      }

    cells.select(col(T), col(U))
      .join(agg, Seq(T, U), "left")
      .na.fill(999.0, Seq(out))
  }
}
