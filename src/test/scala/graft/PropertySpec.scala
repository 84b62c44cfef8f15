package graft

import graft.ops.TemporalOps
import graft.spatial.{Grid, KernelLag}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based tests (SURVEY §5 strategy #4): algebraic invariants of
  * the window and spatial families over ScalaCheck-generated panels
  * (sampled deterministically — seeded — so failures reproduce).
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  import spark.implicits._
  private val T = Panel.TimeCol
  private val U = Panel.UnitCol

  private val seriesGen: Gen[List[Double]] =
    Gen.chooseNum(4, 16).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(Gen.const(0.0), Gen.chooseNum(-50.0, 50.0))))

  /** Deterministic forAll: `count` seeded samples of `gen`. */
  private def forAll[A](gen: Gen[A], count: Int = 10)(body: A => Unit): Unit =
    (0 until count).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }

  private def gen2[A, B](a: Gen[A], b: Gen[B]): Gen[(A, B)] =
    a.flatMap(x => b.map(y => (x, y)))
  private def gen3[A, B, C](a: Gen[A], b: Gen[B], c: Gen[C]): Gen[(A, B, C)] =
    a.flatMap(x => b.flatMap(y => c.map(z => (x, y, z))))

  private def panel1(vs: Seq[Double]) =
    vs.zipWithIndex.map { case (v, i) => (i + 1L, 1L, v) }.toDF(T, U, "value")

  test("tlead(tlag(s,k),k) restores interior rows") {
    forAll(gen2(seriesGen, Gen.chooseNum(1, 3))) { case (vs, k) =>
      if (vs.length > k) {
        val p = panel1(vs)
        val out = p.select(col(T),
            TemporalOps.tlead(TemporalOps.tlag(col("value"), k), k).as("r"))
          .orderBy(T).collect()
        // interior rows (those with both shifts defined) must round-trip
        vs.indices.drop(k).dropRight(k).foreach { i =>
          assert(out(i).getDouble(1) == vs(i), s"row $i of $vs")
        }
      }
    }
  }

  test("moving_sum window additivity: msum_w = msum_a + lagged msum_b (w=a+b)") {
    forAll(gen3(seriesGen, Gen.chooseNum(1, 3), Gen.chooseNum(1, 3))) {
      case (vs, a, b) =>
      val w = a + b
      val p = panel1(vs)
      val out = p.select(col(T), col("value"),
          TemporalOps.movingSum(col("value"), w).as("mw"),
          (TemporalOps.movingSum(col("value"), b) +
            coalesce(TemporalOps.tlag(TemporalOps.movingSum(col("value"), a), b), lit(0.0))).as("split"))
        .orderBy(T).collect()
      out.foreach { r =>
        assert(math.abs(r.getDouble(2) - r.getDouble(3)) < 1e-9,
          s"additivity failed for $vs a=$a b=$b")
      }
    }
  }

  test("cweq: value equal to v increments or resets; counter bounded by prefix") {
    forAll(seriesGen) { vs =>
      val p = panel1(vs)
      val out = TemporalOps.cweq(p, "value", 0.0).orderBy(T)
        .select("cweq").collect().map(_.getInt(0))
      var run = 0
      vs.zip(out).foreach { case (v, c) =>
        run = if (v == 0.0) run + 1 else 0
        assert(c == run, s"cweq mismatch for $vs")
      }
    }
  }

  test("temporal entropy lies in [0, log2(window)]") {
    forAll(gen2(seriesGen, Gen.chooseNum(2, 6))) { case (vs, w) =>
      val p = panel1(vs.map(math.abs)) // entropy needs non-negative inputs
      val out = p.select(col(T),
          TemporalOps.temporalEntropy(col("value"), w, 1.0).as("h"))
        .orderBy(T).collect().map(_.getDouble(1))
      out.foreach { h =>
        assert(h >= -1e-9 && h <= math.log(w) / math.log(2) + 1e-9,
          s"entropy $h out of bounds for $vs w=$w")
      }
    }
  }

  test("normalised kernels sum to 1; splag4d is linear in the input") {
    forAll(gen3(Gen.chooseNum(1, 3), Gen.chooseNum(1, 3), Gen.chooseNum(0.0, 3.0))) {
      case (inner, width, power) =>
      val k = Grid.kernelOffsets(inner, width, power, norm = true)
      assert(math.abs(k.map(_._3).sum - 1.0) < 1e-9)
    }
    // linearity: splag(a·x) = a·splag(x) on a fixed small grid
    val units = Seq(0L, 1L, 40L, 41L)
    def gp(scale: Double) = units.zipWithIndex
      .map { case (u, i) => (1L, u, scale * (i + 1)) }
      .toDF(T, U, "value")
      .withColumn("lon", Grid.unitLon(col(U)))
      .withColumn("lat", Grid.unitLat(col(U)))
    val base = KernelLag.splag4d(gp(1.0), "value", 1, 1, 1.0, norm = false)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    val scaled = KernelLag.splag4d(gp(3.0), "value", 1, 1, 1.0, norm = false)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    units.foreach(u => assert(math.abs(scaled(u) - 3.0 * base(u)) < 1e-9))
  }
}
