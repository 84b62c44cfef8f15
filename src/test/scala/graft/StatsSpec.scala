package graft

import org.apache.spark.sql.functions._

/** Closed-form fixtures for the classical-stats batch: chi-square
  * independence, the one-pass correlation matrix, and trimmed means.
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("chi2Test: perfectly independent table scores 0, dependent flags") {
    // balanced 2×2 — observed == expected everywhere
    val indep = Seq(("x", "u"), ("x", "v"), ("y", "u"), ("y", "v"))
      .flatMap(Seq.fill(10)(_)).toDF("a", "b")
    val r0 = relational.Stats.chi2Test(indep, "a", "b", critical = 3.841)
      .collect().head
    assert((r0.getLong(0), r0.getLong(1), r0.getDouble(2),
      r0.getDouble(3), r0.getBoolean(4)) === (40L, 1L, 0.0, 0.0, false))
    // perfectly dependent 2×2: chi2 = n, Cramér's V = 1
    val dep = (Seq.fill(10)(("x", "u")) ++ Seq.fill(10)(("y", "v")))
      .toDF("a", "b")
    val r1 = relational.Stats.chi2Test(dep, "a", "b", critical = 3.841)
      .collect().head
    assert(r1.getDouble(2) === 20.0 && r1.getDouble(3) === 1.0 &&
      r1.getBoolean(4))
  }

  test("mutualInfo: independent = 0; identical columns = full entropy") {
    val indep = Seq(("x", "u"), ("x", "v"), ("y", "u"), ("y", "v"))
      .flatMap(Seq.fill(5)(_)).toDF("a", "b")
    val r0 = relational.Stats.mutualInfo(indep, "a", "b").collect().head
    assert(r0.getDouble(1) === 0.0 && r0.getDouble(4) === 0.0)
    // A == B: MI = H(A) = ln 2, NMI = 1
    val same = (Seq.fill(10)(("x", "x")) ++ Seq.fill(10)(("y", "y")))
      .toDF("a", "b")
    val r1 = relational.Stats.mutualInfo(same, "a", "b").collect().head
    assert(math.abs(r1.getDouble(1) - math.log(2.0)) < 1e-6)
    assert(r1.getDouble(4) === 1.0)
  }

  test("topValues: per-column ranked value card with shares") {
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq.fill(1)("c"))
      .map((_, 1)).toDF("cat", "one")
    val got = relational.Profile.topValues(df, Seq("cat"), k = 2)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getDouble(3),
        r.getLong(4)))
    assert(got.toSeq === Seq(("a", 6L, 0.6, 1L), ("b", 3L, 0.3, 2L)))
  }

  test("corrMatrix: linear = 1, anti-linear = -1, constant = NULL") {
    val df = (1 to 20).map(i =>
      (i.toDouble, 2.0 * i + 3.0, -1.5 * i + 40.0, 7.0))
      .toDF("x", "y2", "yneg", "const")
    val got = relational.Stats.corrMatrix(df, Seq("x", "y2", "yneg", "const"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got(("x", "y2")).contains(1.0))
    assert(got(("x", "yneg")).contains(-1.0))
    assert(got(("y2", "yneg")).contains(-1.0))
    assert(got(("x", "const")).isEmpty) // zero variance → NULL
  }

  test("histogram: fixed-width bins, max lands in the last bin") {
    val df = (0 to 10).map(_.toDouble).toDF("v")
    val got = relational.Stats.histogram(df, "v", nbins = 5)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    // width 2: bins [0,2) [2,4) [4,6) [6,8) [8,10], value 10 → bin 4
    assert(got.map(_._4).toSeq === Seq(2L, 2L, 2L, 2L, 3L))
    assert(got.head === (0L, 0.0, 2.0, 2L))
    assert(got.last === (4L, 8.0, 10.0, 3L))
  }

  test("timeDecay: credits normalize to 1 and decay with age") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    // two touches 7 days apart, purchase right after the second:
    // w(old) = 2^-1, w(new) = 2^0 → credits 1/3 and 2/3
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), "view"),
      (2L, 1L, ts("2024-01-08 00:00:00"), "click"),
      (3L, 1L, ts("2024-01-08 00:00:00"), "purchase"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = relational.Attribution.timeDecay(ev)
      .collect().map(r => r.getLong(2) -> r.getDouble(5)).toMap
    assert(math.abs(got(1L) - 1.0 / 3.0) < 1e-5)
    assert(math.abs(got(2L) - 2.0 / 3.0) < 1e-5)
  }

  test("welchT: identical groups t=0; shifted groups flag significant") {
    val a = (1 to 50).map(i => 10.0 + (i % 5)).toDF("v")
    val same = relational.Stats.welchT(a, a, "v").collect().head
    assert(same.getDouble(4) === 0.0 && !same.getBoolean(6))
    val b = (1 to 50).map(i => 20.0 + (i % 5)).toDF("v")
    val shifted = relational.Stats.welchT(a, b, "v").collect().head
    assert(shifted.getDouble(2) === 12.0 && shifted.getDouble(3) === 22.0)
    assert(shifted.getBoolean(6) && shifted.getDouble(4) < 0.0)
  }

  test("distinctProfile: exact counts with the sketch inside its envelope") {
    val df = (1 to 200).map(i => (i.toLong, (i % 7).toLong)).toDF("id", "m7")
    val got = relational.Profile.distinctProfile(df, Seq("id", "m7"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(got("id")._1 === 200L && got("m7")._1 === 7L)
    assert(got.values.forall(_._2))
  }

  test("trimmedMean drops the tails the plain mean absorbs") {
    // one huge outlier in group g; 10% trim at n=11 removes it
    val vals = (1 to 10).map(_.toDouble) :+ 1000.0
    val df = vals.map(("g", _)).toDF("grp", "v")
    val r = relational.Stats.trimmedMean(df, "grp", "v", lo = 0.1, hi = 0.9)
      .collect().head
    // exact percentile bounds: q10 = 2.0, q90 = 10.0 → keeps 2..10
    assert(r.getLong(3) === 9L)
    assert(r.getDouble(4) === 6.0)
  }

  test("anovaF: identical groups score 0; separated groups flag") {
    // two groups with the same values → SSB = 0, F = 0
    val same = (1 to 10).flatMap(i =>
      Seq(("a", i.toDouble), ("b", i.toDouble))).toDF("g", "v")
    val r0 = relational.Stats.anovaF(same, "g", "v", critical = 3.0)
      .collect().head
    assert(r0.getLong(0) === 20L && r0.getLong(1) === 2L)
    assert(r0.getDouble(2) === 0.0 && r0.getDouble(4) === 0.0 &&
      !r0.getBoolean(5))
    // hand-computed: a = {1,2,3}, b = {7,8,9} → means 2/8, mu = 5,
    // SSB = 3·9 + 3·9 = 54, SSW = 2 + 2 = 4, F = 54 / (4/4) = 54
    val sep = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 7.0), ("b", 8.0), ("b", 9.0)).toDF("g", "v")
    val r1 = relational.Stats.anovaF(sep, "g", "v", critical = 7.71)
      .collect().head
    assert(r1.getDouble(2) === 54.0 && r1.getDouble(3) === 4.0)
    assert(r1.getDouble(4) === 54.0 && r1.getBoolean(5))
  }

  test("spearman: monotone nonlinear = 1, reversed = -1, ties average") {
    // y = x³ is nonlinear but perfectly monotone → rho = 1 exactly
    val mono = (1 to 12).map(i => (i.toDouble, math.pow(i, 3))).toDF("a", "b")
    assert(relational.Stats.spearman(mono, "a", "b")
      .collect().head.getDouble(1) === 1.0)
    val rev = (1 to 12).map(i => (i.toDouble, -math.pow(i, 3))).toDF("a", "b")
    assert(relational.Stats.spearman(rev, "a", "b")
      .collect().head.getDouble(1) === -1.0)
    // textbook tie case: a = 1,2,3,4 vs b = 1,2,2,3 → rho = 0.9486833
    val tie = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 2.0), (4.0, 3.0))
      .toDF("a", "b")
    assert(math.abs(relational.Stats.spearman(tie, "a", "b")
      .collect().head.getDouble(1) - 0.948683) < 1e-6)
  }

  test("tCloseness: uniform classes score 0; a pure class scores the gap") {
    // global split 50/50; class c1 mirrors it → tvd 0; class c2 is all
    // "u" → tvd = ½(|1 − 0.5| + |0 − 0.5|) = 0.5
    val df = (Seq.fill(5)(("c1", "u")) ++ Seq.fill(5)(("c1", "v")) ++
      Seq.fill(10)(("c2", "u")) ++ Seq.fill(10)(("c3", "v")))
      .toDF("q", "s")
    val got = relational.Profile.tCloseness(df, Seq("q"), "s", t = 0.2)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getBoolean(3)))
      .toMap
    assert(got("c1") === (0.0, false))
    assert(got("c2") === (0.5, true))
    assert(got("c3") === (0.5, true))
  }

  test("kruskalWallis: identical groups score 0; shifted groups flag") {
    // identical distributions: every group's mean rank equals the
    // global (n+1)/2 → H = 0 exactly
    val same = (1 to 10).flatMap(i =>
      Seq(("a", i.toDouble), ("b", i.toDouble))).toDF("g", "v")
    val r0 = relational.Stats.kruskalWallis(same, "g", "v", critical = 3.841)
      .collect().head
    assert(r0.getLong(0) === 20L && r0.getDouble(2) === 0.0 &&
      !r0.getBoolean(3))
    // disjoint shifted groups (no ties): textbook H for two groups of
    // 5 with ranks {1..5} vs {6..10}: H = 12/110·(15²/5+40²/5) − 33
    val sep = ((1 to 5).map(i => ("a", i.toDouble)) ++
      (6 to 10).map(i => ("b", i.toDouble))).toDF("g", "v")
    val r1 = relational.Stats.kruskalWallis(sep, "g", "v", critical = 3.841)
      .collect().head
    val expected = 12.0 / (10 * 11) * (15.0 * 15 / 5 + 40.0 * 40 / 5) -
      3 * 11
    assert(math.abs(r1.getDouble(2) - expected) < 1e-6, s"$r1 vs $expected")
    assert(r1.getBoolean(3))
  }

  test("mannWhitney: U and AUC match brute-force pair counting; " +
      "identical samples give z = 0") {
    // ties included — AUC must half-count them
    val a = Seq(1.0, 2.0, 2.0, 5.0, 7.0)
    val b = Seq(2.0, 3.0, 3.0, 6.0)
    val bruteU = (for (x <- a; y <- b)
      yield if (x > y) 1.0 else if (x == y) 0.5 else 0.0).sum
    val r = relational.Stats.mannWhitney(
      a.map(v => Tuple1(v)).toDF("v"), b.map(v => Tuple1(v)).toDF("v"), "v")
      .collect().head
    assert(r.getLong(0) === 5L && r.getLong(1) === 4L)
    assert(math.abs(r.getDouble(2) - bruteU) < 1e-9, s"$r vs U=$bruteU")
    assert(math.abs(r.getDouble(3) - bruteU / (5 * 4)) < 1e-6)
    // identical samples: U = n²/2, z = 0
    val same = (1 to 8).map(i => Tuple1(i.toDouble)).toDF("v")
    val r0 = relational.Stats.mannWhitney(same, same, "v").collect().head
    assert(r0.getDouble(2) === 32.0 && r0.getDouble(4) === 0.0 &&
      !r0.getBoolean(5))
  }

  test("brownForsythe: equal spreads score ~0; one wild group flags") {
    // same spread around different centers — BF is location-free
    val even = (Seq.tabulate(10)(i => ("a", 10.0 + i)) ++
      Seq.tabulate(10)(i => ("b", 50.0 + i))).toDF("g", "v")
    val r0 = relational.Stats.brownForsythe(even, "g", "v", critical = 4.351)
      .collect().head
    assert(r0.getLong(0) === 20L && r0.getLong(1) === 2L)
    assert(math.abs(r0.getDouble(2)) < 1e-6 && !r0.getBoolean(3))
    // group b spread 20× wider → W flags
    val wild = (Seq.tabulate(10)(i => ("a", 10.0 + i)) ++
      Seq.tabulate(10)(i => ("b", 50.0 + i * 20))).toDF("g", "v")
    val r1 = relational.Stats.brownForsythe(wild, "g", "v", critical = 4.351)
      .collect().head
    assert(r1.getDouble(2) > 4.351 && r1.getBoolean(3), r1.toString)
  }

  test("moodMedian: balanced straddle scores 0; disjoint groups flag") {
    // both groups split evenly around the grand median → chi2 = 0
    val even = (Seq.tabulate(10)(i => ("a", i.toDouble)) ++
      Seq.tabulate(10)(i => ("b", i.toDouble))).toDF("g", "v")
    val r0 = relational.Stats.moodMedian(even, "g", "v", critical = 3.841)
      .collect().head
    assert(r0.getLong(0) === 20L && r0.getDouble(2) === 0.0 &&
      !r0.getBoolean(4))
    assert(r0.getDouble(5) === 4.5) // grand median of two copies of 0..9
    // disjoint: all of a below, all of b above → max dependence
    val apart = (Seq.tabulate(10)(i => ("a", i.toDouble)) ++
      Seq.tabulate(10)(i => ("b", 100.0 + i))).toDF("g", "v")
    val r1 = relational.Stats.moodMedian(apart, "g", "v", critical = 3.841)
      .collect().head
    assert(r1.getBoolean(4), r1.toString)
  }

  test("rake: weighted marginals converge to the targets; already-" +
      "uniform input keeps weight 1") {
    // skewed 2x2: a-marginal 30/10, b-marginal 20/20
    val df = (Seq.fill(15)(("x", "u")) ++ Seq.fill(15)(("x", "v")) ++
      Seq.fill(5)(("y", "u")) ++ Seq.fill(5)(("y", "v"))).toDF("a", "b")
    val out = sampling.Sampling.rake(df, "a", "b",
      Seq("x" -> 0.5, "y" -> 0.5), Seq("u" -> 0.5, "v" -> 0.5), iters = 6)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // achieved a-marginal: sum n*w per a ~ 20 each (N=40, target 0.5)
    val massX = out(("x", "u"))._1 * out(("x", "u"))._2 +
      out(("x", "v"))._1 * out(("x", "v"))._2
    val massU = out(("x", "u"))._1 * out(("x", "u"))._2 +
      out(("y", "u"))._1 * out(("y", "u"))._2
    assert(math.abs(massX - 20.0) < 1e-3, s"$massX")
    assert(math.abs(massU - 20.0) < 1e-3, s"$massU")
    // a perfectly balanced table needs no reweighting
    val flat = (Seq.fill(10)(("x", "u")) ++ Seq.fill(10)(("x", "v")) ++
      Seq.fill(10)(("y", "u")) ++ Seq.fill(10)(("y", "v"))).toDF("a", "b")
    val w1 = sampling.Sampling.rakeUniform(flat, "a", "b")
      .collect().map(_.getDouble(3))
    assert(w1.forall(_ === 1.0), w1.mkString(","))
  }

  test("calibration: a perfect forecast scores brier 0 / ece 0; a " +
      "constant 0.5 on balanced labels gaps by 0") {
    // perfect probabilities: score == label
    val perfect = (Seq.fill(10)((1.0, true)) ++ Seq.fill(10)((0.0, false)))
      .toDF("s", "y")
    val ps = ml.Eval.calibrationSummary(perfect, col("s"), col("y"))
      .collect().head
    assert(ps.getLong(0) === 20L && ps.getDouble(1) === 0.0 &&
      ps.getDouble(2) === 0.0)
    // constant 0.5 forecast on a 50/50 class mix: one bin, frac == pred
    val half = (1 to 20).map(i => (0.5, i % 2 == 0)).toDF("s", "y")
    val hb = ml.Eval.calibration(half, col("s"), col("y"))
      .collect()
    assert(hb.length === 1 && hb.head.getInt(0) === 5 &&
      hb.head.getDouble(2) === 0.5 && hb.head.getDouble(3) === 0.5 &&
      hb.head.getDouble(4) === 0.0)
    // its brier is the irreducible 0.25, ece 0
    val hs = ml.Eval.calibrationSummary(half, col("s"), col("y"))
      .collect().head
    assert(hs.getDouble(1) === 0.25 && hs.getDouble(2) === 0.0)
  }

  test("weightOfEvidence: independent feature ~0 IV; perfect separator " +
      "large; liftChart: a perfect ranking captures all in the top") {
    // independent: both categories 50% positive -> woe 0, iv 0
    val indep = (Seq.fill(10)(("a", true)) ++ Seq.fill(10)(("a", false)) ++
      Seq.fill(10)(("b", true)) ++ Seq.fill(10)(("b", false)))
      .toDF("f", "y")
    val w0 = ml.Eval.weightOfEvidence(indep, "f", col("y"))
      .collect().map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(w0.values.forall { case (woe, iv) => woe === 0.0 && iv === 0.0 })
    // perfect separator: a all-positive, b all-negative
    val sep = (Seq.fill(10)(("a", true)) ++ Seq.fill(10)(("b", false)))
      .toDF("f", "y")
    val w1 = ml.Eval.weightOfEvidence(sep, "f", col("y"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(w1("a") > 2.0 && w1("b") < -2.0, w1.toString)
    // lift: scores = labels, 4 buckets over 20 rows (5 pos)
    val scored = (1 to 20).map(i => (if (i <= 5) 1.0 else 0.0, i <= 5))
      .toDF("s", "y")
    val lc = ml.Eval.liftChart(scored, col("s"), col("y"), buckets = 4)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(4), r.getDouble(5))).toMap
    // bucket 1 (top 5 scores) holds every positive: capture 1, lift 4
    assert(lc(1) === (5L, 5L, 1.0, 4.0), lc.toString)
    assert(lc(4)._3 === 1.0 && lc(4)._4 === 1.0) // full population
  }

  test("mcnemar: symmetric flips score 0, one-way flips flag; " +
      "cohensKappa: identity = 1, independence = 0") {
    // 5 flips each way: chi2 = 0
    val sym = (Seq.fill(5)((true, false)) ++ Seq.fill(5)((false, true)) ++
      Seq.fill(10)((true, true))).toDF("x", "y")
    val r0 = relational.Stats.mcnemar(sym, col("x"), col("y")).collect().head
    assert(r0.getLong(0) === 20L && r0.getDouble(3) === 0.0 &&
      !r0.getBoolean(4))
    // 10 flips one way only: chi2 = 100/10 = 10 > 3.841
    val one = (Seq.fill(10)((true, false)) ++ Seq.fill(10)((true, true)))
      .toDF("x", "y")
    val r1 = relational.Stats.mcnemar(one, col("x"), col("y")).collect().head
    assert(r1.getDouble(3) === 10.0 && r1.getBoolean(4))
    // kappa: perfect agreement on a balanced table = 1
    val same = (Seq.fill(10)(("u", "u")) ++ Seq.fill(10)(("v", "v")))
      .toDF("a", "b")
    assert(relational.Stats.cohensKappa(same, "a", "b")
      .collect().head.getDouble(3) === 1.0)
    // independence (all four cells equal): po = pe -> kappa 0
    val indep = (for (x <- Seq("u", "v"); y <- Seq("u", "v");
                      _ <- 1 to 5) yield (x, y)).toDF("a", "b")
    assert(relational.Stats.cohensKappa(indep, "a", "b")
      .collect().head.getDouble(3) === 0.0)
  }

  test("diversityIndex: balanced = evenness 1, single category degenerate") {
    val balanced = (Seq.fill(10)("a") ++ Seq.fill(10)("b") ++
      Seq.fill(10)("c")).map((_, 1)).toDF("cat", "one")
    val r = relational.Profile.diversityIndex(balanced, "cat")
      .collect().head
    assert(r.getLong(0) === 3L && r.getLong(1) === 30L)
    assert(math.abs(r.getDouble(2) - math.log(3.0)) < 1e-6) // H = ln 3
    assert(r.getDouble(3) === 1.0)                          // evenness
    assert(math.abs(r.getDouble(4) - 1.0 / 3.0) < 1e-6)     // Simpson
    val single = Seq.fill(5)("x").map((_, 1)).toDF("cat", "one")
    val rs = relational.Profile.diversityIndex(single, "cat")
      .collect().head
    assert(rs.getDouble(2) === 0.0 && rs.isNullAt(3) &&
      rs.getDouble(4) === 1.0)
  }

  test("equiDepthHistogram: quartiles of 1..8 hold 2 values each") {
    val df = (1 to 8).map(_.toDouble).toDF("v")
    val got = relational.Stats.equiDepthHistogram(df, "v", nbins = 4)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    // interior quantiles of 1..8 at (.25,.5,.75) = (2.75, 4.5, 6.25):
    // values AT a boundary go left, so each bin holds exactly 2
    assert(got.map(_._4).toSeq === Seq(2L, 2L, 2L, 2L))
    assert(got.head === (0L, 1.0, 2.75, 2L))
    assert(got.last === (3L, 6.25, 8.0, 2L))
  }

  test("zipfFit: an exact power law recovers its exponent") {
    // counts ≈ 3000·r⁻¹ → ln(cnt) ≈ −1·ln(r) + ln 3000 up to rounding
    val tokens = (1 to 30).flatMap { r =>
      Seq.fill(math.max(1, math.round(3000.0 / r).toInt))(f"tok$r%03d")
    }
    val df = tokens.grouped(500).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val r = text.TextOps.zipfFit(df, topN = 30).collect().head
    assert(r.getLong(0) === 30L)
    // counts 3000/r fit ln c = ln 3000 − ln r up to rounding → slope ≈ −1
    assert(math.abs(r.getDouble(1) + 1.0) < 0.02)
    assert(math.abs(r.getDouble(3) + 1.0) < 0.01) // r ≈ −1 (perfect fit)
  }
}
