package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Engagement analytics over an event log: rolling-window distinct
  * actives (the DAU/WAU family) and top session paths. Both are event
  * analytics the reference's panel transforms stop short of
  * (`utilities.py` aggregates fixed month panels; these work on the
  * raw stream).
  *
  * Scale shapes:
  *  - rolling distinct: the corpus-scale work is ONE day-keyed
  *    aggregation; the rolling union then runs over #days rows of
  *    fixed-size HLL sketches (the production path), while the exact
  *    verification path expands distinct (day, user) pairs windowSize×
  *    — bounded by actives×days, never raw events.
  *  - session paths: one user-keyed shuffle to assign gap sessions,
  *    one (user, session) aggregation, one path-keyed count, then a
  *    TakeOrderedAndProject top-k (never a global sort).
  */
object Engagement {

  private val UsPerDay = 86400000000L

  /** Rolling `windowDays`-day distinct `idCol` per day, with the HLL
    * sketch estimate checked against the exact count in the same
    * result (the q_vocab_approx envelope discipline: the emitted
    * `within_5pct` verdict hash-mismatches the gate if the sketch
    * drifts).
    *
    * Exact side: distinct (day, id) pairs exploded to the following
    * `windowDays` target days, then a distinct count per target day.
    * Sketch side: one `hll_sketch_agg` per day (mergeable, fixed
    * memory), each daily sketch exploded to its target days and
    * merged with `hll_union_agg` — at 100 TB the union pass touches
    * #days sketch rows only, which is why the sketch path is the
    * production one and the exact path is the verification baseline.
    * Partial leading windows are kept (expanding-window semantics).
    *
    * @return (day, dau_exact, within_5pct) — day is epoch days.
    */
  /** (day, id) projection of an event log, day = epoch days. */
  def byDay(events: DataFrame, idCol: String = "user_id"): DataFrame =
    events.select(
      expr(s"unix_micros(ts) div $UsPerDay").as("day"), col(idCol).as("__id"))

  private def targets(windowDays: Int) =
    expr(s"explode(sequence(day, day + ${windowDays - 1}))")

  /** Stickiness ratio per day — DAU / rolling `windowDays`-day actives
    * (the classic DAU/WAU or DAU/MAU habit metric: 1.0 = every weekly
    * active shows up daily). Both counts are exact distincts on the
    * [[rollingExact]] machinery; the inner join on the daily side
    * keeps observed days only (the rolling explode manufactures
    * target days past the stream end). Integer counts, one division,
    * 1e-6 output rounding — layout-proof.
    *
    * @return (day, dau, wau, stickiness) — day is epoch days
    */
  def stickiness(events: DataFrame, idCol: String = "user_id",
                 windowDays: Int = 7): DataFrame = {
    require(windowDays >= 2, s"windowDays must be >= 2, got $windowDays")
    val dau = byDay(events, idCol).distinct()
      .groupBy("day").agg(countDistinct(col("__id")).as("dau"))
    val wau = rollingExact(events, idCol, windowDays)
      .select(col("day"), col("dau_exact").as("wau"))
    dau.join(wau, "day")
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau") / col("wau"), 6).as("stickiness"))
  }

  /** Per-user inter-event BURSTINESS — Goh–Barabási's
    * B = (σ − μ)/(σ + μ) over the user's inter-event gaps (−1 perfectly
    * periodic, 0 Poisson, →1 bursty): the behavioural fingerprint that
    * separates bots/schedulers from humans in an event log.
    *
    * Exactness: gaps are exact integer MICROSECONDS from one ordered
    * lag on the user partitioning; μ and σ derive from exact integer
    * sums (the welchT discipline: n·Σg² − (Σg)² in DECIMAL); floats
    * appear only in the final closed form. Users with < 3 events (< 2
    * gaps) report null.
    *
    * @return (user_id, n_gaps, mean_gap_sec, burstiness)
    */
  def burstiness(events: DataFrame, idCol: String = "user_id"): DataFrame = {
    val d = "decimal(38,0)"
    val wU = Window.partitionBy(col(idCol))
      .orderBy(col("__t"), col("event_id"))
    val gaps = events
      .select(col(idCol), expr("unix_micros(ts)").as("__t"), col("event_id"))
      .withColumn("__g", col("__t") - lag(col("__t"), 1).over(wU))
      .filter(col("__g").isNotNull)
    val st = gaps.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("__g").cast(d)).as("__s"),
        sum(col("__g").cast(d) * col("__g")).as("__q"))
    val mean = col("__s").cast("double") / col("n_gaps")
    // population σ from the exact sums, in micros
    val varNum = (col("n_gaps").cast(d) * col("__q") -
      col("__s") * col("__s")).cast("double")
    val sd = sqrt(varNum) / col("n_gaps")
    st.select(col(idCol), col("n_gaps"),
      round(mean / 1e6, 6).as("mean_gap_sec"),
      when(col("n_gaps") < 2 || (sd + mean) === 0.0,
        lit(null).cast("double"))
        .otherwise(round((sd - mean) / (sd + mean), 6)).as("burstiness"))
  }

  /** Exact rolling distinct — the verification baseline: distinct
    * (day, id) pairs exploded windowDays×, then a distinct count per
    * target day. Bounded by actives×days, never raw events.
    */
  def rollingExact(events: DataFrame, idCol: String = "user_id",
                   windowDays: Int = 7): DataFrame =
    byDay(events, idCol).distinct()
      .select(targets(windowDays).as("day"), col("__id"))
      .groupBy("day").agg(countDistinct(col("__id")).as("dau_exact"))

  /** Rolling estimate from per-day sketch partials `(day, __sk)` —
    * merges partials per day, then unions each day's sketch into its
    * following windowDays target days. The input may carry SEVERAL
    * partial sketches per day (e.g. one per ingest epoch from
    * [[graft.streaming.DauStream]]); HLL union is register-wise max,
    * so partial merge order never matters.
    */
  def rollingSketchEstimate(daily: DataFrame, windowDays: Int): DataFrame =
    daily
      .select(targets(windowDays).as("day"), col("__sk"))
      .groupBy("day")
      .agg(expr("hll_sketch_estimate(hll_union_agg(__sk))").as("__est"))

  /** One HLL sketch per day — the production aggregation (mergeable,
    * fixed memory per day).
    */
  def dailySketches(events: DataFrame, idCol: String = "user_id"): DataFrame =
    byDay(events, idCol)
      .groupBy("day").agg(expr("hll_sketch_agg(__id)").as("__sk"))

  def rollingDistinctUsers(events: DataFrame, idCol: String = "user_id",
                           windowDays: Int = 7,
                           relErr: Double = 0.05): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val exact = rollingExact(events, idCol, windowDays)
    val est = rollingSketchEstimate(dailySketches(events, idCol), windowDays)
    gate(events, exact, est, relErr)
  }

  /** Join the exact and estimated rolling counts into the envelope
    * verdict row, keeping observed days only (the explode manufactures
    * target days past the stream end).
    */
  def gate(events: DataFrame, exact: DataFrame, est: DataFrame,
           relErr: Double = 0.05): DataFrame =
    exact.join(est, Seq("day"))
      .join(byDay(events).select("day").distinct(), Seq("day"), "left_semi")
      .select(col("day"), col("dau_exact"),
        (abs(col("__est") - col("dau_exact").cast("double")) <=
          greatest(col("dau_exact").cast("double") * relErr, lit(1.0)))
          .as("within_5pct"))

  /** Cohort LTV curve — cumulative purchase revenue per user by cohort
    * age: users cohorted by their first-event period (integer-div
    * epoch weeks, the retention convention), purchase value summed as
    * exact cents per (cohort, age) cell, then accumulated down each
    * cohort's age axis. The per-cohort cumulative window is bounded by
    * the observation span in periods, never by users or events.
    *
    * @return (cohort_week, age_week, n_users, revenue, ltv_per_user)
    */
  def ltvCurve(events: DataFrame, periodSec: Long = 7L * 86400L,
               conversionType: String = "purchase"): DataFrame = {
    val periodUs = periodSec * 1000000L
    val e = events.select(col("user_id"), unix_micros(col("ts")).as("__t"),
      col("value"), col("event_type"))
    val cohorts = e.groupBy("user_id")
      .agg(min(col("__t")).as("__t0"))
      .select(col("user_id"), expr(s"__t0 div $periodUs").as("cohort_week"))
    val sizes = cohorts.groupBy("cohort_week")
      .agg(count(lit(1)).as("n_users"))
    val cells = e.filter(col("event_type") === conversionType)
      .join(cohorts, "user_id")
      .groupBy(col("cohort_week"),
        (expr(s"__t div $periodUs") - col("cohort_week")).as("age_week"))
      .agg(sum(round(col("value") * 100).cast("long")).as("__cents"))
    val w = Window.partitionBy("cohort_week").orderBy("age_week")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .join(broadcast(sizes), "cohort_week") // bounded by #periods
      .withColumn("__cum", sum(col("__cents")).over(w))
      .select(col("cohort_week"), col("age_week"), col("n_users"),
        round(col("__cents").cast("double") / 100, 6).as("revenue"),
        round(col("__cum").cast("double") / 100.0 / col("n_users"), 6)
          .as("ltv_per_user"))
  }

  /** Top-`k` session event-type paths: gap-based sessions (a new
    * session starts after `gapSeconds` of inactivity), each session's
    * path = its first `maxLen` event types joined with '>', ranked by
    * session count.
    *
    * The top-k is orderBy+limit — Spark plans TakeOrderedAndProject
    * (per-partition heaps + a k-row driver merge), never a global
    * sort; the k-row rank window is bounded by construction.
    *
    * @return (path, n_sessions, path_rank)
    */
  def sessionPaths(events: DataFrame, gapSeconds: Long = 3600,
                   maxLen: Int = 8, k: Int = 20): DataFrame = {
    require(maxLen >= 1 && k >= 1, s"maxLen/k must be >= 1")
    val gapUs = gapSeconds * 1000000L
    val ev = events.select(col("user_id"),
      unix_micros(col("ts")).as("__t"), col("event_id"), col("event_type"))
    val w = Window.partitionBy("user_id").orderBy(col("__t"), col("event_id"))
    val sessions = ev
      .withColumn("__new",
        when(col("__t") - lag(col("__t"), 1).over(w) <= gapUs, lit(0L))
          .otherwise(lit(1L)))
      .withColumn("__sid", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // array_sort on (t, event_id, type) structs = deterministic event
    // order inside one map-side-combinable collect
    val paths = sessions
      .groupBy(col("user_id"), col("__sid"))
      .agg(array_sort(collect_list(
        struct(col("__t"), col("event_id"), col("event_type")))).as("__evs"))
      .select(concat_ws(">",
        slice(expr("transform(__evs, e -> e.event_type)"), 1, maxLen))
        .as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
    val top = paths.orderBy(col("n_sessions").desc, col("path")).limit(k)
    top.withColumn("path_rank",
      row_number().over(Window.partitionBy(graft.plans.PlanLint.kBoundedKey(col("n_sessions")))
        .orderBy(col("n_sessions").desc, col("path"))).cast("long"))
  }
}
