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
      r0.getBoolean(3)) === (40L, 1L, 0.0, false))
    // perfectly dependent 2×2: chi2 = n
    val dep = (Seq.fill(10)(("x", "u")) ++ Seq.fill(10)(("y", "v")))
      .toDF("a", "b")
    val r1 = relational.Stats.chi2Test(dep, "a", "b", critical = 3.841)
      .collect().head
    assert(r1.getDouble(2) === 20.0 && r1.getBoolean(3))
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
}
