package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Closed-form fixtures for the r9 analytics tail: triangle counting,
  * Kaplan–Meier survival, multi-touch attribution, the KS drift test,
  * per-unit ACF, Gini concentration, and l-diversity.
  */
class AnalyticsTailSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d 00:00:${sec}%02d")

  test("triangleCounts: K4 plus a pendant path") {
    // K4 on 1-4 (every node in 3 triangles), pendant 5 hanging off 4
    // and an isolated edge 6-7 (all zero triangles)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (6L, 7L),
      (2L, 1L), (3L, 3L)) // reversed duplicate + self-loop must vanish
      .toDF("id_a", "id_b")
    val got = graphs.Triangles.triangleCounts(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L,
      5L -> 0L, 6L -> 0L, 7L -> 0L))
  }

  test("kaplanMeier: textbook product-limit with late-tail censoring") {
    // horizon max = day 28; censorDays 7 ⇒ churned iff last < day 21.
    // u1: d0..d2  (dur 2, churned)   u2: d0..d2  (dur 2, churned)
    // u3: d0..d5  (dur 5, churned)   u4: d20..d25 (dur 5, censored)
    // u5: d1..d28 (dur 27, censored)
    val ev = Seq((1L, ts(1)), (1L, ts(3)), (2L, ts(1)), (2L, ts(3)),
      (3L, ts(1)), (3L, ts(6)), (4L, ts(21)), (4L, ts(26)),
      (5L, ts(2)), (5L, ts(29))).toDF("user_id", "ts")
    val got = relational.Survival.kaplanMeier(ev, censorDays = 7)
      .orderBy("duration_days")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    // dur 2: d=2 n=5 → S=0.6; dur 5: d=1,c=1 n=3 → S=0.6·(2/3)=0.4;
    // dur 27: censor-only row, S carries 0.4
    assert(got === Seq((2L, 2L, 0L, 5L, 0.6), (5L, 1L, 1L, 3L, 0.4),
      (27L, 0L, 1L, 1L, 0.4)))
  }

  test("kaplanMeier: everyone churning drives survival to exactly 0") {
    val ev = Seq((1L, ts(1)), (1L, ts(2)), (2L, ts(1)), (2L, ts(3)),
      (9L, ts(28))).toDF("user_id", "ts") // u9 anchors the horizon
    val got = relational.Survival.kaplanMeier(ev, censorDays = 7)
      .orderBy("duration_days").collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(got(2L) === 0.0) // last churn row: factor 1 − 1/1 = 0
  }

  test("multiTouch: linear and U-shaped credits across path lengths") {
    def e(id: Long, u: Long, d: Int, t: String) = (id, u, ts(d), t)
    val ev = Seq(
      // u1: 4 touches then a purchase → 0.4/0.2/0.2/0.4... wait n=4:
      // first 0.4, last 0.4, two middles 0.1 each
      e(1, 1, 1, "view"), e(2, 1, 2, "click"), e(3, 1, 3, "view"),
      e(4, 1, 4, "cart"), e(5, 1, 5, "purchase"),
      // u2: 1 touch → 1.0; later orphan touch (no next conversion)
      e(6, 2, 1, "view"), e(7, 2, 2, "purchase"), e(8, 2, 3, "view"),
      // u3: 2 touches → 0.5 each
      e(9, 3, 1, "view"), e(10, 3, 2, "click"), e(11, 3, 3, "purchase"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = relational.Attribution.multiTouch(ev)
      .collect()
      .map(r => (r.getLong(3), (r.getLong(2), r.getLong(5), r.getLong(6),
        r.getDouble(7), r.getDouble(8)))).toMap
    assert(got.size === 7) // the orphan touch 8 is dropped
    assert(got(1L) === ((5L, 4L, 1L, 0.25, 0.4)))
    assert(got(2L) === ((5L, 4L, 2L, 0.25, 0.1)))
    assert(got(3L) === ((5L, 4L, 3L, 0.25, 0.1)))
    assert(got(4L) === ((5L, 4L, 4L, 0.25, 0.4)))
    assert(got(6L) === ((7L, 1L, 1L, 1.0, 1.0)))
    assert(got(9L) === ((11L, 2L, 1L, 0.5, 0.5)))
    assert(got(10L) === ((11L, 2L, 2L, 0.5, 0.5)))
  }

  test("ksTest: identical samples give D=0, disjoint give D=1") {
    val a = (1 to 100).map(_.toDouble).toDF("v")
    val same = sampling.Sampling.ksTest(a, a, "v").collect().head
    assert(same.getDouble(2) === 0.0 && !same.getBoolean(4))
    val b = (101 to 200).map(_.toDouble).toDF("v")
    val disj = sampling.Sampling.ksTest(a, b, "v").collect().head
    assert(disj.getDouble(2) === 1.0 && disj.getBoolean(4))
  }

  test("acf: a linear series is perfectly autocorrelated at every lag") {
    val df = (for (u <- 1 to 3; t <- 1 to 10)
      yield (t.toLong, u.toLong, t.toDouble * u, 0.0))
      .toDF("month_id", "unit_id", "value", "value2")
    val got = ops.TemporalOps.acf(df, "value", maxLag = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    for (u <- 1L to 3L; l <- 1 to 2)
      assert(got((u, l)) === ((10L - l, 1.0)), s"unit $u lag $l")
  }

  test("acf: constant series yields null (zero variance)") {
    val df = (1 to 8).map(t => (t.toLong, 1L, 5.0, 0.0))
      .toDF("month_id", "unit_id", "value", "value2")
    val rows = ops.TemporalOps.acf(df, "value", maxLag = 1).collect()
    assert(rows.length === 1 && rows.head.isNullAt(3))
  }

  test("gini: equality is 0, total concentration is (n-1)/n") {
    val eq = Seq((1L, 10.0), (2L, 10.0), (3L, 10.0), (4L, 10.0))
      .toDF("u", "amt")
    val g0 = relational.Profile.gini(eq, "amt", "u").collect().head
    assert(g0.getLong(0) === 4L && g0.getDouble(1) === 40.0 &&
      g0.getDouble(2) === 0.0)
    val one = Seq((1L, 0.0), (2L, 0.0), (3L, 0.0), (4L, 100.0))
      .toDF("u", "amt")
    val g1 = relational.Profile.gini(one, "amt", "u").collect().head
    assert(g1.getDouble(2) === 0.75)
  }

  test("hopDistance: path graph relaxes one hop per pass, null past radius") {
    // path 1-2-3-4-5-6 plus isolated edge 8-9; seed = {1}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (8L, 9L)).toDF("id_a", "id_b")
    val got = graphs.Bfs.hopDistance(edges, id => id === 1L, maxHops = 3)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L,
      5L -> -1L, 6L -> -1L, 8L -> -1L, 9L -> -1L))
  }

  test("kcore: pendants and chains peel away, the triangle core survives") {
    // triangle {1,2,3} + pendant 4-1 + disconnected edge 5-6
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L), (5L, 6L))
      .toDF("id_a", "id_b")
    val got = graphs.KCore.kcore(edges, k = 2, rounds = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    // 2-core = the triangle with in-core degree 2, fixpoint reached
    assert(got === Map(1L -> (2L, true), 2L -> (2L, true),
      3L -> (2L, true)))
    // 3-core: empty — node 1's degree-3 start collapses once the
    // pendant peels; convergence still reported (empty fixpoint)
    assert(graphs.KCore.kcore(edges, k = 3, rounds = 3).isEmpty)
    // ONE round of k=2 peel keeps the triangle+nothing else and is
    // already the fixpoint for this graph (4,5,6 drop in round one)
    val one = graphs.KCore.kcore(edges, k = 2, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(one.keySet === Set(1L, 2L, 3L) && one.values.forall(_ == true))
  }

  test("modularity: perfect two-community split scores 0.5; one blob 0") {
    // two disjoint triangles
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L)).toDF("id_a", "id_b")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
      (6L, 4L)).toDF("id", "label")
    val r = graphs.GraphStats.modularity(edges, labels).collect().head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) === (6L, 2L, 0.5))
    // everything one community: Q = 1 - 1 = 0 exactly
    val one = labels.select(col("id"), lit(0L).as("label"))
    assert(graphs.GraphStats.modularity(edges, one)
      .collect().head.getDouble(2) === 0.0)
  }

  test("assortativity: a star is perfectly disassortative (-1); a " +
      "regular graph is degenerate (null)") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
      .toDF("id_a", "id_b")
    val rs = graphs.GraphStats.assortativity(star).collect().head
    assert(rs.getLong(0) === 4L && rs.getDouble(1) === -1.0)
    // a triangle: every degree 2, zero variance -> null
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("id_a", "id_b")
    assert(graphs.GraphStats.assortativity(tri).collect().head.isNullAt(1))
  }

  test("componentStats: histogram over a CC labelling with totals") {
    val docs = Seq((1L, "x"), (2L, "x"), (3L, "y"), (4L, "z"), (5L, "w"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val cc = dedup.Dedup.connectedComponents(docs, pairs)
    val got = dedup.Dedup.componentStats(cc)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // one 3-cluster {1,2,3}, two singletons {4} {5}
    assert(got === Map(3L -> ((1L, 3L, 0.6)), 1L -> ((2L, 2L, 0.4))))
  }

  test("conversionLatency: first-touch to conversion per path") {
    def e(id: Long, u: Long, d: Int, t: String) = (id, u, ts(d), t)
    val ev = Seq(
      e(1, 1, 1, "view"), e(2, 1, 3, "click"), e(3, 1, 5, "purchase"),
      e(4, 2, 2, "view"), e(5, 2, 2, "purchase"), // same-day: latency 0
      e(6, 3, 1, "view")) // orphan — no conversion, no row
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = relational.Attribution.conversionLatency(ev)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(3), r.getDouble(4))).toMap
    assert(got.size === 2)
    assert(got(1L) === ((3L, 2L, 4.0 * 86400))) // day1 → day5
    assert(got(2L) === ((5L, 1L, 0.0)))
  }

  test("tfidfTerms: corpus-wide terms rank below distinctive ones") {
    val docs = Seq(
      (1L, "alpha common common"), (2L, "beta common"),
      (3L, "gamma common")).toDF("doc_id", "text")
    val got = text.Index.tfidfTerms(docs, k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(5)) -> r.getString(1)).toMap
    // idf(common, df=3) = ln(4/4)+1 = 1; idf(rare, df=1) = ln(2)+1
    // doc1: common tf=2·1 = 2.0 < alpha 1·1.693 — wait: alpha scores
    // 1.693, common scores 2.0 → common ranks FIRST in doc1 (tf wins)
    assert(got((1L, 1L)) === "common" && got((1L, 2L)) === "alpha")
    assert(got((2L, 1L)) === "beta" && got((2L, 2L)) === "common")
    assert(got((3L, 1L)) === "gamma" && got((3L, 2L)) === "common")
  }

  test("lDiversity: homogeneous class flagged, diverse class not") {
    val df = Seq((1, "a"), (1, "a"), (1, "a"),
      (2, "a"), (2, "b"), (2, "c")).toDF("quasi", "sens")
    val got = relational.Profile.lDiversity(df, Seq("quasi"), "sens", 3L)
      .collect().map(r => r.getInt(0) -> (r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(got(1) === ((1L, true)) && got(2) === ((3L, false)))
  }

  test("logRank: identical cohorts score 0; early-churn cohort flags") {
    // cohort A: 8 users churn at day 1; anchor user 99 runs to day 20
    // (sets the horizon so the early exits really churn)
    def cohort(base: Long, churnDay: Int) =
      ((1 to 8).flatMap(u => Seq((base + u, ts(1)), (base + u, ts(churnDay))))
        ++ Seq((base + 99L, ts(1)), (base + 99L, ts(20))))
        .zipWithIndex.map { case ((u, t), i) =>
          (i.toLong, t, u, "view", 1.0, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val same = relational.Survival.logRank(cohort(100, 2), cohort(200, 2),
      censorDays = 7).collect().head
    assert(same.getDouble(2) === 0.0 && !same.getBoolean(3))
    val diff = relational.Survival.logRank(cohort(100, 2), cohort(200, 12),
      censorDays = 7).collect().head
    assert(diff.getDouble(2) > 3.841 && diff.getBoolean(3),
      s"clearly different churn must flag: $diff")
  }

  test("personalizedPageRank: mass stays near the seed, sums to ~1") {
    // path 1-2-3-4-5-6 with seed {1}: ppr decays with distance
    val edges = (1L to 5L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = graphs.PageRank
      .personalizedPageRank(edges, iters = 8, maxSeedId = 2L)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got.values.sum - 1.0) < 1e-3,
      s"mass must be conserved: $got")
    assert(got(1L) > got(2L) && got(2L) > got(3L) && got(3L) > got(4L),
      s"rank must decay with distance from the seed: $got")
  }

  test("burstiness: periodic gaps score -1, two-scale gaps positive-ish") {
    // user 1: perfectly periodic (gaps all 60 s) → σ = 0 → B = −1
    val periodic = (0 to 10).map(i => (1L, ts(1, i * 5)))
    // user 2: nine 1 s gaps then one 3600 s gap → σ ≫ μ → B > 0
    val bursty = (0 to 9).map(i => (2L, ts(1, i))) :+ ((2L, ts(2, 0)))
    val ev = (periodic ++ bursty).zipWithIndex.map { case ((u, t), i) =>
      (i.toLong, t, u, "view", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = relational.Engagement.burstiness(ev)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3)))
      .toMap
    assert(got(1L) === ((10L, -1.0)))
    assert(got(2L)._2 > 0.4, s"bursty user must score high: $got")
  }

  test("runsTest: alternation maximizes runs, a two-regime block minimizes") {
    import graft.ops.TemporalOps
    def p(vs: Double*) = vs.zipWithIndex.map { case (v, i) =>
      (i + 1L, 1L, v) }.toDF(Panel.TimeCol, Panel.UnitCol, "value")
    // strict alternation: every kept row starts a new run → z > 0
    val alt = p(1, 9, 1, 9, 1, 9, 1, 9)
    val ra = TemporalOps.runsTest(alt, "value").collect().head
    assert((ra.getLong(1), ra.getLong(2), ra.getLong(3)) === ((4L, 4L, 8L)))
    assert(ra.getDouble(4) > 1.5)
    // two regimes: exactly 2 runs → z < 0
    val reg = p(1, 1, 1, 1, 9, 9, 9, 9)
    val rr = TemporalOps.runsTest(reg, "value").collect().head
    assert(rr.getLong(3) === 2L && rr.getDouble(4) < -1.5)
  }

  test("fkCandidates: full containment flags, partial does not") {
    val parent = (1L to 10L).map(Tuple1(_)).toDF("pk")
    val childOk = Seq(1L, 2L, 2L, 9L).map(Tuple1(_)).toDF("ck")
    val childBad = Seq(1L, 2L, 99L).map(Tuple1(_)).toDF("ck")
    val got = relational.Integrity.fkCandidates(Seq(
        ("ok", childOk, "ck", parent, "pk"),
        ("bad", childBad, "ck", parent, "pk")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3), r.getDouble(4), r.getBoolean(5)))
      .toMap
    assert(got("ok") === ((3L, 3L, 1.0, true)))
    assert(got("bad") === ((3L, 2L, 0.666667, false)))
  }

  test("linkPredict: a path's endpoints share the middle; edges excluded") {
    // star around 2 (edges 2-1, 2-3, 2-4): the non-adjacent pairs all
    // go through z=2 (deg 3) → AA = 1/ln 3; each leaf has degree 1 so
    // the neighbor union is 1+1−1 = 1 → Jaccard 1.0
    val edges = Seq((1L, 2L), (2L, 3L), (2L, 4L)).toDF("id_a", "id_b")
    val got = graphs.LinkPredict.scores(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val aa = BigDecimal(math.round(1e9 / math.log(3.0)) / 1e9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.keySet === Set((1L, 3L), (1L, 4L), (3L, 4L)))
    assert(got.values.forall { case (c, j, a) =>
      c == 1L && j == 1.0 && math.abs(a - aa) < 1e-9 })
    // adjacent pair (1,2) must never appear even though it shares no
    // neighbor; K3 has no missing links at all
    val k3 = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("id_a", "id_b")
    assert(graphs.LinkPredict.scores(k3).count() === 0L)
  }

  test("stickiness: daily regulars score 1, a past spike dilutes") {
    // user 10 active every day 1..7; users 20, 21 spike on day 6 only
    val ev = ((1 to 7).map(d => (10L, ts(d))) ++
      Seq((20L, ts(6)), (21L, ts(6))))
      .zipWithIndex.map { case ((u, t), i) =>
        (i.toLong, t, u, "view", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = relational.Engagement.stickiness(ev)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    // days 1..5: dau 1 / wau 1 → 1.0; day 6: 3/3 → 1.0;
    // day 7: only the regular shows, spikers still in the window → 1/3
    assert(got.length === 7)
    assert(got.count(_ == ((1L, 1L, 1.0))) === 5)
    assert(got.count(_ == ((3L, 3L, 1.0))) === 1)
    assert(got.count(_ == ((1L, 3L, 0.333333))) === 1)
  }
}
