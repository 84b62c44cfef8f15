package graft

import org.apache.spark.sql.functions._

class RegistrySpec extends SparkSpec {
  import spark.implicits._
  private val T = Panel.TimeCol
  private val U = Panel.UnitCol

  private def p = Seq((1L, 1L, 0.0), (2L, 1L, 0.0), (3L, 1L, 5.0),
    (4L, 1L, 0.0), (5L, 1L, 0.0), (6L, 1L, 0.0)).toDF(T, U, "value")

  test("JSON pipeline spec composes transforms (reference wire format)") {
    // the canonical ViEWS feature: decayed time-since-event
    val out = Registry.run(p, """[{"type":"time_since","args":[0]},
      {"type":"decay","args":[2]}]""")
      .orderBy(T).select("value").collect().map(_.getDouble(0))
    // time_since: months 2..6 -> 1,2,0,1,2 ; decay halflife 2 -> 2^(-ts/2)
    val ts = Seq(1.0, 2.0, 0.0, 1.0, 2.0)
    out.toSeq.zip(ts.map(t => math.pow(2.0, -t / 2.0))).foreach { case (a, e) =>
      assert(math.abs(a - e) < 1e-14) // Spark's pow (StrictMath) may differ 1 ulp
    }
  }

  test("string args reach the fill family through the wire format") {
    val withNulls = Seq[(Long, Long, Option[Double])](
      (1L, 1L, None), (2L, 1L, Some(3.0)), (3L, 1L, None), (4L, 1L, Some(5.0)),
      (5L, 1L, None)
    ).toDF(T, U, "value")
    val ff = Registry.run(withNulls, """[{"type":"fill","args":["forward"]}]""")
      .orderBy(T).collect().map(r => if (r.isNullAt(2)) null else r.getDouble(2)).toSeq
    assert(ff == Seq(null, 3.0, 3.0, 5.0, 5.0))
    val interp = Registry.run(withNulls,
      """[{"type":"extrapolate","args":["both","inside"]}]""")
      .orderBy(T).collect().map(r => if (r.isNullAt(2)) null else r.getDouble(2)).toSeq
    assert(interp == Seq(null, 3.0, 4.0, 5.0, null))
  }

  test("unknown transform raises with the known list") {
    val e = intercept[IllegalArgumentException](
      Registry.run(p, """[{"type":"nope"}]"""))
    assert(e.getMessage.contains("unknown transform 'nope'"))
    assert(e.getMessage.contains("tlag"))
  }

  test("every operator family dispatches through the wire format") {
    // tiny 2-unit panel with value2 so every family can execute
    val mp = Seq((1L, 0L, 1.0, 2.0), (1L, 1L, 3.0, 4.0),
      (2L, 0L, 5.0, 6.0), (2L, 1L, 0.0, 1.0)).toDF(T, U, "value", "value2")
    val specs = Seq(
      """[{"type":"add_column"}]""",
      """[{"type":"divide_column","args":["value2"]}]""",
      """[{"type":"tick_time_since"}]""",
      """[{"type":"splag4d","args":[1,1,1,false]}]""",
      """[{"type":"splag_country","args":[1,1,0,false]}]""",
      """[{"type":"tree_lag","args":[0.5,0]}]""",
      """[{"type":"grid_lag","args":[10,0]}]""",
      """[{"type":"fourier_lag"}]""",
      """[{"type":"spacetime_dist","args":["distances",1,1,0,0]}]""",
      """[{"type":"temporal_tree_lag","args":[0.8,"uniform"]}]""")
    specs.foreach { s =>
      val out = Registry.run(mp, s)
      assert(out.columns.contains("value"), s)
      assert(out.select("value").count() > 0, s)
    }
  }

  test("a chained window pipeline stays a single-shuffle plan") {
    val out = Registry.run(p, """[{"type":"tlag","args":[1]},
      {"type":"moving_average","args":[3]},{"type":"demean","args":[]}]""")
    val shuffles = out.queryExecution.executedPlan.toString()
      .split("\n").count(_.contains("Exchange"))
    assert(shuffles <= 1, s"expected at most 1 shuffle, got $shuffles:\n${out.queryExecution.executedPlan}")
  }
}
