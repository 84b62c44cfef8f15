package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.plans.PlanLint

/** The plan linter must flag each scale-breaking shape and stay quiet
  * on the engine's own audited plans.
  */
class PlanLintSpec extends SparkSpec {
  import spark.implicits._

  private def df(n: Int) = (1 to n).map(i => (i.toLong, i * 2.0)).toDF("k", "v")

  test("flags an unkeyed cartesian product as fatal") {
    val a = df(10); val b = df(10).withColumnRenamed("k", "k2")
    // inequality-only join condition forces a cartesian/BNL plan
    val cross = a.join(b, a("v") < b("v"))
    val f = PlanLint.lint(cross)
    assert(f.exists(x => x.severity == "fatal" || x.node == "BroadcastNestedLoopJoin"),
      f.mkString("; "))
  }

  test("flags an unpartitioned window as fatal") {
    val w = df(10).withColumn("r", row_number().over(Window.orderBy("k")))
    val f = PlanLint.fatal(w)
    assert(f.exists(_.node == "Window"), PlanLint.lint(w).mkString("; "))
  }

  test("a constant-keyed bounded window passes (the engine convention)") {
    val w = df(10).withColumn("r", row_number().over(
      Window.partitionBy(pmod(col("k"), lit(1))).orderBy("k")))
    assert(PlanLint.fatal(w).isEmpty, PlanLint.lint(w).mkString("; "))
  }

  test("a global sort is advisory, a keyed aggregation is clean") {
    val sorted = df(100).orderBy("v")
    assert(PlanLint.lint(sorted).exists(x =>
      x.node == "Sort" && x.severity == "advisory"))
    val agg = df(100).groupBy("k").agg(sum("v"))
    assert(PlanLint.fatal(agg).isEmpty, PlanLint.lint(agg).mkString("; "))
  }

  test("floatGate red-flags an order-dependent double running sum " +
      "feeding a coarse-rounded gate output (the broken cusum shape)") {
    val panel = (1L to 5L).flatMap(m => (0L to 3L).map(u =>
      (m, u, (m * 7 + u).toDouble / 3.0)))
      .toDF(Panel.TimeCol, Panel.UnitCol, "value")
    // the r8/r9 formulation that failed the driver gate three rounds
    // running: ordered unbounded SUM(double) minus n·round(μ,9), margin
    // rounded to 1e-6 — the cancellation amplifies cross-engine window
    // reassociation noise above the output grid
    val wAll = Window.partitionBy(Panel.UnitCol)
    val cum = Panel.cumulative
    val mean = round(avg(col("value")).over(wAll), 9)
    val sd = round(stddev_pop(col("value")).over(wAll), 9)
    val cs = sum(col("value")).over(cum) - count(col("value")).over(cum) * mean
    val broken = panel.select(col(Panel.TimeCol), col(Panel.UnitCol),
      cs.as("cusum"),
      (round(abs(cs) - lit(3.0) * sd, 6) > 0.0).cast("int").as("breach"))
    val f = PlanLint.floatGateFatal(broken)
    assert(f.nonEmpty, PlanLint.floatGate(broken).mkString("; "))
  }

  test("floatGate greenlights the integer-fixed cusum and bounded frames") {
    val panel = (1L to 5L).flatMap(m => (0L to 3L).map(u =>
      (m, u, (m * 7 + u).toDouble / 3.0)))
      .toDF(Panel.TimeCol, Panel.UnitCol, "value")
    // the shipped fix: 1e-9-unit long summands, integer cancellation
    val fixed = panel.select(col(Panel.TimeCol), col(Panel.UnitCol),
      graft.ops.TemporalOps.cusum(col("value")).as("c"))
      .select(col(Panel.TimeCol), col(Panel.UnitCol),
        col("c.cusum"), col("c.breach"))
    assert(PlanLint.floatGateFatal(fixed).isEmpty,
      PlanLint.floatGate(fixed).mkString("; "))
    // a bounded trailing float sum feeding a rounded output is fine:
    // k-term noise has no t-amplification (moving_sum family)
    val msum = panel.select(col(Panel.TimeCol), col(Panel.UnitCol),
      round(graft.ops.TemporalOps.movingSum(col("value"), 3), 6).as("ms"))
    assert(PlanLint.floatGateFatal(msum).isEmpty,
      PlanLint.floatGate(msum).mkString("; "))
  }

  test("floatGate sweeps the window-statistics gate family clean " +
      "(the cusum failure class, by construction)") {
    // every hash-gated query built on ordered window accumulation —
    // the family where cross-engine reassociation noise can hide.
    // Plans are ANALYZED only (floatGate needs no execution beyond
    // the shared panel build).
    val family = Seq("q_cusum", "q_cusum_stream", "q_ewma", "q_ewma_stream",
      "q_mavg", "q_msum", "q_trend", "q_decompose", "q_acf", "q_pacf",
      "q_changepoint", "q_theil_sen", "q_rolling_corr", "q_forecast",
      "q_seasonal_strength", "q_mann_kendall", "q_runs_test", "q_entropy",
      "q_demean", "q_winsorize", "q_robust_scale")
    family.foreach { name =>
      val qdf = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      assert(PlanLint.floatGateFatal(qdf).isEmpty,
        s"$name: ${PlanLint.floatGate(qdf).mkString("; ")}")
    }
  }

  test("the engine's own scale-audited operators lint clean of fatals") {
    val docs = Seq((1L, "a b c d e"), (2L, "b c d e f"), (3L, "x y z w q"))
      .toDF("doc_id", "text")
    assert(PlanLint.fatal(graft.dedup.Dedup.exact(docs)).isEmpty)
    assert(PlanLint.fatal(
      graft.text.TextOps.chunkDocuments(docs, 3, 1)).isEmpty)
    val panel = (1L to 3L).flatMap(m => (0L to 5L).map(u =>
      (m, u, (m + u).toDouble))).toDF(Panel.TimeCol, Panel.UnitCol, "value")
    assert(PlanLint.fatal(panel.select(col(Panel.TimeCol), col(Panel.UnitCol),
      graft.ops.TemporalOps.ewma(col("value"), 0.5, 3).as("e"))).isEmpty)
  }
}
