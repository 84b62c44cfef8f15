package graft

import graft.spatial.{Grid, KernelLag, TreeLag}
import org.apache.spark.sql.functions._

/** Physical-plan assertions: the scale-critical join strategies the
  * operators are designed around must actually appear in the plans
  * (regressions here are invisible to value-level tests).
  */
class PlanSpec extends SparkSpec {
  import spark.implicits._
  private val T = Panel.TimeCol
  private val U = Panel.UnitCol

  private def gridPanel = {
    val rows = for (m <- 1L to 3L; u <- 0L until 60L) yield (m, u, (u + m).toDouble)
    rows.toDF(T, U, "value")
      .withColumn("lon", Grid.unitLon(col(U)))
      .withColumn("lat", Grid.unitLat(col(U)))
  }

  test("splag4d joins the kernel via broadcast, never a shuffled kernel side") {
    val plan = KernelLag.splag4d(gridPanel, "value", 1, 1, 1.0, norm = false)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("tree lag's geometry tables broadcast; node values aggregate hash-side") {
    val plan = TreeLag.treeLag(gridPanel, "value", 0.5, 0)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("HashAggregate"), plan)
  }

  test("grid lag never materialises the mesh x target product in the plan") {
    val plan = TreeLag.gridLag(gridPanel, "value", threshold = 50.0, dfunctionOption = 0)
      .queryExecution.executedPlan.toString()
    // the product is evaluated inside the per-(month, block) kernel;
    // any nested-loop/cartesian node would mean it crossed the shuffle
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("spacetime kNN broadcasts raw events only; as-of join is unit-keyed") {
    val plan = spatial.SpacetimeDist.spacetimeDistances(
        gridPanel, "value", "distances", k = 1, nu = 1.0, power = 0.0)
      .queryExecution.executedPlan.toString()
    // the old shape broadcast events x month-pairs (O(E x T)) and hash-
    // joined on month_id; the new shape must not join events on month
    assert(!plan.contains("BroadcastHashJoin [month_id"), plan)
    // stage 1 is the units x raw-events product (broadcast side O(E))
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    // stage 2 joins candidates to cells as an equi join keyed by unit
    val unitJoin = plan.split("\n").exists(l =>
      (l.contains("HashJoin") || l.contains("SortMergeJoin")) && l.contains("unit_id"))
    assert(unitJoin, plan)
  }
}
