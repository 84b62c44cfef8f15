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
  * Spark-first plan, tuned for scale (two-stage, broadcast O(E)):
  *  1. Per (unit, event-month) spatial top-k against the broadcast RAW
  *     event set — within one event-month the time term is constant, so
  *     only the k spatially-nearest events of that month can ever reach
  *     the unit's global top-k at any t (exact pruning). The broadcast
  *     never depends on month count; the product streams into bounded
  *     partial aggregation, never across a shuffle.
  *  2. The as-of predicate `e_t <= t` rides a shuffled EQUI-join keyed
  *     by unit (k·event-months candidate rows per unit), reduced
  *     map-side by a second bounded top-k (or codegen'd min for k=1
  *     distances).
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

  /** Banded candidate generation spec: events bucket into coarse
    * `bandCells`-wide grid cells; each unit joins only the events of
    * the (2·ring+1)² band cells around its own (an equi-join on the
    * cell key — candidate volume is ring-bounded, never O(units×E)).
    * Exactness is preserved by a distance-bound check: a (unit,
    * event-month) group is provably complete when it found ≥ k
    * candidates whose kth spatial distance² is strictly below
    * (0.5·ring·bandCells)² — the minimum any outside-ring event can
    * attain — or when the ring already holds ALL of that month's
    * events; every other group recomputes against the month's full
    * event set (an equi-join on event month, volume = unsafe pairs ×
    * month density). The 100 TB path for dense event sets, where the
    * O(E) broadcast of the default path stops fitting.
    */
  final case class Band(bandCells: Double, ring: Int) {
    require(bandCells > 0.0, "bandCells must be positive")
    require(ring >= 1, "ring must be >= 1")
  }

  /** Event count past which the O(E) broadcast product stops being the
    * right stage-1 plan and the ring-bounded banded generator takes
    * over. The broadcast path ships every event to every task and
    * streams a units×E product into the top-k aggregation — fine while
    * E is broadcast-sized (tens of MB), a bottleneck when the event
    * set itself is data-scale. 2M events ≈ 80 MB broadcast at 5
    * doubles/row — the upper edge of comfortable.
    */
  val AutoBandEvents: Long = 2000000L

  /** The band geometry auto-dispatch falls back to. Any geometry is
    * EXACT (the banded generator proves each group complete or
    * recomputes it against the month's full event set), so this only
    * tunes performance: 4°-wide bands with a 1-cell ring bound
    * candidates to a 12°×12° neighbourhood.
    */
  val DefaultBand: Band = Band(4.0, 1)

  /** The stage-1 dispatch rule, pure so plans/tests can pin it: an
    * explicit request wins; otherwise band when the event count
    * crosses `autoBandEvents`.
    */
  def chooseBand(eventCount: Long, banded: Option[Band],
                 autoBandEvents: Long): Option[Band] =
    banded.orElse(
      if (eventCount > autoBandEvents) Some(DefaultBand) else None)

  /** @param monthCap compat quirk: the reference processes only the
    * first 600 months (`times[0:600]`, spacetime_distance.py:127);
    * pass Some(600) to replicate (months beyond the cap keep their
    * rows but are never computed — they get the 999.0 sentinel).
    * @param banded Some(Band(...)) swaps the stage-1 O(E)-broadcast
    * candidate generator for the ring-bounded banded one (identical
    * results by construction; see [[Band]]). None defers to the
    * auto-dispatch: the broadcast product is cheaper for sparse event
    * sets, the band join once event density makes O(units×E) the
    * bottleneck.
    * @param autoBandEvents event-count threshold for the automatic
    * banded dispatch when `banded` is None (one count job over the
    * filtered event set — negligible next to the candidate product it
    * sizes). `Long.MaxValue` pins the broadcast path.
    */
  def spacetimeDistances(panel: DataFrame, valueCol: String,
                         returnValues: String, k: Int, nu: Double, power: Double,
                         eventThreshold: Double = 0.0,
                         lonCol: String = "lon", latCol: String = "lat",
                         out: String = "stdist",
                         monthCap: Option[Int] = None,
                         banded: Option[Band] = None,
                         autoBandEvents: Long = AutoBandEvents): DataFrame = {
    val spark = panel.sparkSession
    val T = Panel.TimeCol
    val U = Panel.UnitCol
    require(returnValues == "distances" || returnValues == "weights",
      s"return_values must be 'distances' or 'weights', got $returnValues")

    // The bounded-buffer aggregate lives in ObjectHashAggregate, whose
    // default sort-based fallback kicks in at 128 groups — far below a
    // panel's (month, cell) cardinality. Raise the threshold only if
    // the session still has the default, so we never clobber an
    // operator-external tuning choice; sessions built by Bench/Verify
    // set it explicitly.
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    if (spark.conf.getOption(key).forall(_ == "128"))
      spark.conf.set(key, "4000000")

    val allCells = panel.select(col(T), col(U))
    val (cells, events) = monthCap match {
      case Some(cap) =>
        val months = panel.select(col(T)).distinct().orderBy(col(T)).limit(cap)
        (allCells.join(broadcast(months), T, "left_semi"),
          panel.filter(col(valueCol) > eventThreshold)
            .join(broadcast(months), T, "left_semi")
            .select(col(T).as("e_t"), col(lonCol).as("e_lon"),
              col(latCol).as("e_lat"), col(valueCol).as("e_size"), col(U).as("e_u")))
      case None =>
        (allCells,
          panel.filter(col(valueCol) > eventThreshold)
            .select(col(T).as("e_t"), col(lonCol).as("e_lon"),
              col(latCol).as("e_lat"), col(valueCol).as("e_size"), col(U).as("e_u")))
    }

    // Stage 1 — per (unit, event-month) spatial top-k. Within one
    // event-month the time term is constant across candidates, so the
    // spatial order IS the full order: only the k spatially-nearest
    // events of each month can ever reach a unit's global top-k at any
    // later t (an exact pruning, not an approximation). The broadcast
    // is the RAW event set — O(E), independent of month count — and
    // the product never crosses a shuffle: it streams straight into
    // the bounded top-k partial aggregation.
    //
    // Squared distance through the hot path: d² orders identically to
    // d, needs only multiplications (Spark's pow is StrictMath.pow —
    // an order of magnitude slower than x*x); sqrt/pow run only on the
    // ~k rows per cell that survive aggregation.
    // one geo row per unit, even if a panel carries inconsistent or
    // time-varying unit coordinates — a distinct on (unit, lon, lat)
    // would emit duplicate per-month candidates and corrupt the k>1 mean
    val unitGeo = panel.groupBy(col(U))
      .agg(first(col(lonCol)).as(lonCol), first(col(latCol)).as(latCol))
    val sdx = (col(lonCol) - col("e_lon")) * 0.5
    val sdy = (col(latCol) - col("e_lat")) * 0.5
    val topk = udaf(new TopK(k))
    // explicit request short-circuits the count job; otherwise one
    // count over the filtered events decides broadcast vs banded
    val dispatch: Option[Band] =
      if (banded.isDefined) banded
      else if (autoBandEvents == Long.MaxValue) None
      else chooseBand(events.count(), banded, autoBandEvents)
    val perMonthTop: DataFrame = dispatch match {
      case None =>
        unitGeo.crossJoin(broadcast(events))
          .withColumn("sd2", sdx * sdx + sdy * sdy)
          .groupBy(col(U), col("e_t"))
          .agg(topk(col("sd2"), col("e_t"), col("e_u"), col("e_size")).as("cs"))
          .select(col(U), col("cs"))
      case Some(Band(b, r)) =>
        // ring-bounded candidates: equi-join unit ring cells × event
        // band cells, then prove each (unit, event-month) group
        // complete or recompute it against that month's full event
        // set. The event table feeds FOUR consumers here (band join,
        // month totals, distinct months, fallback join) — persist it
        // once instead of re-filtering the panel per consumer.
        val ev = graft.OpCache.persist(events)
        val eb = ev
          .withColumn("ebx", floor(col("e_lon") / b).cast("long"))
          .withColumn("eby", floor(col("e_lat") / b).cast("long"))
        val offsets = for { dx <- -r to r; dy <- -r to r } yield (dx, dy)
        val offArr = array(offsets.map { case (dx, dy) =>
          struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy")) }: _*)
        val unitCells = unitGeo
          .select(col(U), col(lonCol), col(latCol), explode(offArr).as("o"))
          .withColumn("cbx", floor(col(lonCol) / b).cast("long") + col("o.dx"))
          .withColumn("cby", floor(col(latCol) / b).cast("long") + col("o.dy"))
        val ringTop = unitCells
          .join(eb, col("cbx") === col("ebx") && col("cby") === col("eby"))
          .withColumn("sd2", sdx * sdx + sdy * sdy)
          .groupBy(col(U), col("e_t"))
          .agg(topk(col("sd2"), col("e_t"), col("e_u"), col("e_size")).as("cs"),
            count(lit(1)).as("__cnt"))
        val monthTotals = ev.groupBy(col("e_t"))
          .agg(count(lit(1)).as("__mtotal"))
        // outside-ring events sit ≥ ring band cells away in some
        // coordinate, so their scaled distance² is ≥ (0.5·ring·b)²;
        // strict < keeps distance TIES at the bound exact too
        val minOut2 = { val g = 0.5 * r * b; g * g }
        // persisted: the safe filter AND the unsafe fallback both
        // consume this frame — without a materialization boundary the
        // whole ring-join + top-k subtree executes once per branch
        // (measured ~2× the operator)
        val checked = graft.OpCache.persist(unitGeo
          .crossJoin(broadcast(ev.select(col("e_t")).distinct()))
          .join(ringTop, Seq(U, "e_t"), "left")
          .join(broadcast(monthTotals), Seq("e_t"))
          .withColumn("__kth2", element_at(col("cs"), -1).getField("_1"))
          .withColumn("__safe", col("__cnt").isNotNull &&
            ((col("__cnt") >= k && col("__kth2") < minOut2) ||
              col("__cnt") === col("__mtotal"))))
        val safe = checked.filter(col("__safe")).select(col(U), col("cs"))
        val unsafeTop = checked.filter(!col("__safe"))
          .select(col("e_t"), col(U), col(lonCol), col(latCol))
          .join(ev, Seq("e_t"))
          .withColumn("sd2", sdx * sdx + sdy * sdy)
          .groupBy(col(U), col("e_t"))
          .agg(topk(col("sd2"), col("e_t"), col("e_u"), col("e_size")).as("cs"))
          .select(col(U), col("cs"))
        safe.unionByName(unsafeTop)
    }
    val cand = perMonthTop
      .select(col(U), explode(col("cs")).as("c"))
      .select(col(U), col("c._1").as("sd2"), col("c._2").as("e_t"),
        col("c._3").as("e_u"), col("c._4").as("e_size"))

    // Stage 2 — the as-of predicate rides on an EQUI-join keyed by
    // unit (candidates are k·event-months rows per unit), so the join
    // shuffles O(cells + candidates) rows and partial aggregation
    // reduces each (month, cell) group map-side. No month-expanded
    // event table exists anywhere in the plan.
    val dt = (col(T) - col("e_t")) * nu
    val stream = cells.join(cand, U)
      .filter(col("e_t") <= col(T))
      .withColumn("d2", col("sd2") + dt * dt)

    def weightOf2(d2: org.apache.spark.sql.Column, size: org.apache.spark.sql.Column) =
      when(d2 === 0.0, size).otherwise(size / pow(d2, power / 2.0))

    val agg: DataFrame =
      if (k == 1 && returnValues == "distances")
        // plain double min stays in whole-stage codegen'd HashAggregate
        stream.groupBy(col(T), col(U)).agg(sqrt(min(col("d2"))).as(out))
      else {
        val topkFull = udaf(new TopK(k))
        val grouped = stream.groupBy(col(T), col(U))
          .agg(topkFull(col("d2"), col("e_t"), col("e_u"), col("e_size")).as("cands"))
        val c = explode(col("cands")).as("c")
        val per = grouped.select(col(T), col(U), c)
          .select(col(T), col(U), col("c._1").as("d2"), col("c._4").as("e_size"))
        val perEvent = if (returnValues == "distances") sqrt(col("d2"))
                       else weightOf2(col("d2"), col("e_size"))
        if (returnValues == "distances")
          // reference fidelity: cKDTree.query pads missing neighbours
          // with inf when fewer than k events exist yet, so the mean is
          // inf for months with 0 < count < k (spacetime_distance.py:
          // 160-186)
          per.groupBy(col(T), col(U))
            .agg(avg(perEvent).as("__m"), count(lit(1)).as("__n"))
            .select(col(T), col(U),
              when(col("__n") < k, lit(Double.PositiveInfinity))
                .otherwise(col("__m")).as(out))
        else
          // the reference's weights path crashes (IndexError swallowed
          // by a bare except, leaving np.empty garbage) when count < k;
          // we deliberately return the mean of the available weights
          // instead of reproducing that bug (SURVEY §7.3 bug list)
          per.groupBy(col(T), col(U)).agg(avg(perEvent).as(out))
      }

    allCells
      .join(agg, Seq(T, U), "left")
      .na.fill(999.0, Seq(out))
  }
}
