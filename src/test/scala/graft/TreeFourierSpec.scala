package graft

import graft.spatial.{FourierLag, TreeLag}
import org.apache.spark.sql.functions._

/** Invariant + golden tests for the Barnes-Hut tree lags and the
  * Fourier lag.
  */
class TreeFourierSpec extends SparkSpec {
  import spark.implicits._
  private val T = Panel.TimeCol
  private val U = Panel.UnitCol

  test("temporal tree walk partitions the past: uniform weights == cumsum") {
    // every stocked month <= tnow must carry total weight exactly 1,
    // regardless of thetacrit; the final timestep has no leaf (quirk)
    for (crit <- Seq(0.1, 0.8, 2.0); n <- Seq(7, 30, 33)) {
      val times = (1L to n.toLong)
      val wm = temporal.TreeLag.weightMatrix(times, crit, "uniform", 1.0)
      val byTnow = wm.groupBy(_._1)
      for (tnow <- times.dropRight(1)) {
        val months = byTnow.getOrElse(tnow, Seq.empty)
          .map(t => (t._2, t._3)).toMap
        val expected = (1L to tnow).map(m => m -> 1.0).toMap
        assert(months == expected,
          s"crit=$crit n=$n tnow=$tnow: got $months")
      }
      assert(!byTnow.contains(n.toLong), s"final timestep must be empty (crit=$crit n=$n)")
    }
  }

  test("temporal tree lag == running cumsum on a panel (uniform)") {
    val rows = for (m <- 1L to 6L; u <- Seq(1L, 2L)) yield (m, u, (m * 10 + u).toDouble)
    val p = rows.toDF(T, U, "value")
    val out = temporal.TreeLag.treeLag(p, "value", 0.8, "uniform")
      .orderBy(U, T).collect().map(_.getDouble(2)).toSeq
    val exp = (1L to 6L).map(m => (1L to m).map(mm => mm * 10 + 1).sum.toDouble)
      .updated(5, 0.0) ++
      (1L to 6L).map(m => (1L to m).map(mm => mm * 10 + 2).sum.toDouble).updated(5, 0.0)
    assert(out == exp)
  }

  test("spatial tree lag with tiny thetacrit degenerates to all-pairs weighted sum") {
    // thetacrit -> 0 opens everything: interaction list = all other
    // leaves, weight f(d) with d the inter-cell distance (+0.01 nudges)
    val units = Seq(0L, 1L, 40L, 41L)
    val rows = for (m <- Seq(1L); u <- units) yield (m, u, u.toDouble + 1.0)
    val p = rows.toDF(T, U, "value")
      .withColumn("lon", spatial.Grid.unitLon(col(U)))
      .withColumn("lat", spatial.Grid.unitLat(col(U)))
    val out = TreeLag.treeLag(p, "value", 0.001, 1)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    val emb = TreeLag.embed(Seq((0L, 0, 0), (1L, 1, 0), (40L, 0, 1), (41L, 1, 1)))
    def d(a: (Int, Int), b: (Int, Int)) = {
      val dx = a._1 - b._1 + 0.01; val dy = a._2 - b._2 + 0.01
      math.sqrt(dx * dx + dy * dy)
    }
    val cells = emb.cells
    val exp0 = units.filter(_ != 0L).map(u =>
      (u + 1.0) / d(cells(0L), cells(u))).sum
    assert(math.abs(out(0L) - exp0) < 1e-9, s"got ${out(0L)} want $exp0")
  }

  test("adaptive mesh is a disjoint exact cover of the occupied cells every month") {
    val units = Seq(0L, 1L, 2L, 40L, 41L, 42L, 80L, 81L, 82L)
    val rows = for (m <- Seq(1L, 2L); u <- units)
      yield (m, u, if (m == 1L && u == 41L) 100.0 else 1.0)
    val p = rows.toDF(T, U, "value")
      .withColumn("lon", spatial.Grid.unitLon(col(U)))
      .withColumn("lat", spatial.Grid.unitLat(col(U)))
    val emb = spatial.TreeLag.embed(units.map(u =>
      (u, (u % 40).toInt, (u / 40).toInt)))
    // threshold 50: month 1 splits down to the hot cell, month 2 stays coarse
    val mesh = spatial.TreeLag.adaptiveMesh(
      p.select(col(T), col(U), col("value")), "value", 50.0, emb)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2).toLong, r.getInt(3).toLong))
    // cover check: every unit cell maps to exactly one mesh node per month
    for (m <- Seq(1L, 2L); u <- units) {
      val (ex, ey) = emb.cells(u)
      val covering = mesh.filter { case (mm, lvl, nx, ny) =>
        mm == m && ex / (emb.ncells >> lvl) == nx && ey / (emb.ncells >> lvl) == ny
      }
      assert(covering.length == 1, s"unit $u month $m covered by ${covering.length} nodes")
    }
    // month 2 (all values <= threshold): mesh is just the root
    assert(mesh.count(_._1 == 2L) == 1)
    assert(mesh.count(_._1 == 1L) > 1)
  }

  test("multi-weight tree/grid lags equal per-function single runs") {
    val units = Seq(0L, 1L, 2L, 40L, 41L, 42L)
    val rows = for (m <- Seq(1L, 2L); u <- units) yield (m, u, (u % 7 + m).toDouble)
    val p = rows.toDF(T, U, "value")
      .withColumn("lon", spatial.Grid.unitLon(col(U)))
      .withColumn("lat", spatial.Grid.unitLat(col(U)))
    // tree: both dfunctions in one pass == two single-function runs
    val multi = spatial.TreeLag.treeLagWith(p, "value", 0.5,
      Seq("w_logd" -> spatial.TreeLag.dfunction(0),
          "w_d2" -> spatial.TreeLag.dfunction(2)))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(2), r.getDouble(3)))).toMap
    val single0 = spatial.TreeLag.treeLag(p, "value", 0.5, 0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val single2 = spatial.TreeLag.treeLag(p, "value", 0.5, 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    multi.foreach { case (k, (a, b)) =>
      assert(math.abs(a - single0(k)) < 1e-12 && math.abs(b - single2(k)) < 1e-12)
    }
    // grid: a custom weight lambda (reference's dict extension point)
    // evaluates inside the dense per-month kernel
    val custom = spatial.TreeLag.gridLagWith(p, "value", 10.0,
      Seq("inv_sq" -> ((d: Double) => 1.0 / (d * d + 1.0))))
    assert(custom.columns.toSeq == Seq(T, U, "inv_sq"))
    assert(custom.count() == 12)
  }

  test("FFT round-trips and matches the DFT definition") {
    val n = 8
    val re = Array.tabulate(n)(i => math.sin(i * 1.7) + i)
    val im = new Array[Double](n)
    val re0 = re.clone()
    FourierLag.fft(re, im, invert = false)
    // check against naive DFT at a few frequencies
    for (k <- Seq(0, 1, 5)) {
      val er = (0 until n).map(t => re0(t) * math.cos(-2 * math.Pi * k * t / n)).sum
      val ei = (0 until n).map(t => re0(t) * math.sin(-2 * math.Pi * k * t / n)).sum
      assert(math.abs(re(k) - er) < 1e-10 && math.abs(im(k) - ei) < 1e-10)
    }
    FourierLag.fft(re, im, invert = true)
    re.zip(re0).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
  }

  test("3-D fft matches direct DFT composition (round-trip + conv equivalence)") {
    val n = 8
    val l = 2
    val re = Array.tabulate(n * n * l)(i => math.cos(i * 0.37) * (i % 5))
    val im = new Array[Double](n * n * l)
    val re0 = re.clone()
    FourierLag.fft3(re, im, n, l, invert = false)
    FourierLag.fft3(re, im, n, l, invert = true)
    re.zip(re0).foreach { case (a, b) => assert(math.abs(a - b) < 1e-11) }
  }

  test("3-D fourier slice: zero -> zero; impulse rescales to rhomax at some cell") {
    val n = 16
    assert(FourierLag.solveSlice3d(new Array[Double](n * n), n).forall(_ == 0.0))
    val x = new Array[Double](n * n)
    x(7 * n + 9) = 5.0
    val y = FourierLag.solveSlice3d(x, n)
    assert(y.max <= 5.0 + 1e-9)
    assert(y.forall(_ >= -1e-9))
    // peak of the midplane response sits at the impulse
    assert(y.indexOf(y.max) == 7 * n + 9)
  }

  test("fourier lag slice: zero input -> zero output; scaling matches max") {
    val n = 16
    val zero = FourierLag.solveSlice(new Array[Double](n * n), n)
    assert(zero.forall(_ == 0.0))
    val x = new Array[Double](n * n)
    x(5 * n + 7) = 3.0
    val y = FourierLag.solveSlice(x, n)
    assert(math.abs(y.max - 3.0) < 1e-12) // rescaled to rhomax
    assert(math.abs(y.min) < 1e-12)       // zero level subtracted
  }
}
