package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/** Physical-plan linter: walks a DataFrame's executed plan and reports
  * the shapes that break at cluster scale — the same checklist the
  * engine's own operators are audited against (PLANS.md), packaged so
  * a pipeline author can gate THEIR composed query before submitting
  * it to a 1000-executor cluster:
  *
  *   - `CartesianProduct` — O(n·m) with no pruning, almost always a
  *     missing join key;
  *   - `BroadcastNestedLoopJoin` — fine when the build side is a
  *     bounded query/kernel table, fatal when it is data-sized (the
  *     linter cannot know which, so it reports it as advisory);
  *   - a `Window` with no partition keys — every row through ONE task;
  *   - a global `Sort` feeding something other than a bounded
  *     take — full-data single ordering;
  *   - single-partition `Exchange` (`SinglePartition`) below a
  *     non-limit operator.
  *
  * Returns findings rather than throwing: callers decide what is
  * acceptable (tests assert `fatal.isEmpty`, a service might log).
  */
object PlanLint {

  final case class Finding(severity: String, node: String, detail: String)

  // the STATIC physical plan: under AQE the executed plan is an
  // AdaptiveSparkPlanExec wrapper whose real tree only materialises at
  // run time — the static plan is what a pre-submit lint can see, and
  // AQE only ever improves on it (it cannot introduce a cartesian)
  def lint(df: DataFrame): Seq[Finding] = lintPlan(df.queryExecution.sparkPlan)

  def lintPlan(plan: SparkPlan): Seq[Finding] = {
    val findings = scala.collection.mutable.ArrayBuffer.empty[Finding]
    def simpleName(p: SparkPlan): String =
      p.getClass.getSimpleName.stripSuffix("Exec")
    plan.foreach { node =>
      val name = simpleName(node)
      name match {
        case "CartesianProduct" =>
          findings += Finding("fatal", name,
            "unkeyed cross product — O(left × right) rows with no pruning")
        case "BroadcastNestedLoopJoin" =>
          findings += Finding("advisory", name,
            "nested-loop join over a broadcast side — fine for bounded " +
              "query/kernel tables, fatal if the build side is data-sized")
        case "Window" =>
          // an unpartitioned window funnels the WHOLE input through one
          // task; the engine's own k-bounded windows carry a constant
          // pmod partition key precisely so this check stays meaningful
          node match {
            case w: org.apache.spark.sql.execution.window.WindowExec
                if w.partitionSpec.isEmpty =>
              findings += Finding("fatal", name,
                "window with NO partition keys — all rows in one task")
            case _ => ()
          }
        case "Sort" =>
          node match {
            case s: org.apache.spark.sql.execution.SortExec if s.global =>
              findings += Finding("advisory", name,
                "global sort — full-data ordering; acceptable only under " +
                  "a bounded take or as a deliberate final ordering")
            case _ => ()
          }
        case _ => ()
      }
      if (node.toString.startsWith("Exchange SinglePartition"))
        findings += Finding("advisory", "Exchange",
          "single-partition exchange — downstream runs on one task")
    }
    findings.toSeq
  }

  /** The findings a plan must never carry. */
  def fatal(df: DataFrame): Seq[Finding] =
    lint(df).filter(_.severity == "fatal")
}
