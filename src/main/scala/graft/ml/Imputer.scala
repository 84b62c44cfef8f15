package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Regression imputation — the Spark analogue of the reference's
  * `_fill_iterative` (missing.py:165-209: sklearn IterativeImputer with
  * a linear estimator, predictions clipped to the observed min/max).
  *
  * With one predictor column the round-robin iteration converges in a
  * single pass, so this is the exact closed form: OLS of the target on
  * the predictor over observed rows (computed as one aggregation, no
  * MLlib dependency, no driver-side data), predictions clipped. For
  * multi-column panels, `iterativeImpute` round-robins this per column.
  * Exact numeric parity with sklearn's BayesianRidge is not achievable
  * (SURVEY §7.3); the parity target is the regression structure.
  */
object Imputer {

  /** Impute nulls in `targetCol` from `featureCol` by OLS, clipped to
    * the observed range of the target.
    */
  def regressionImpute(df: DataFrame, targetCol: String, featureCol: String,
                       out: String = "imputed"): DataFrame = {
    val t = col(targetCol)
    val x = col(featureCol)
    val obs = df.filter(t.isNotNull)
    val st = obs.agg(
      avg(x).as("__mx"), avg(t).as("__my"),
      sum(x * t).as("__sxy"), sum(x * x).as("__sxx"),
      count(lit(1)).cast("double").as("__n"),
      min(t).as("__vmin"), max(t).as("__vmax"))
    // zero-variance (constant) predictor → slope 0, i.e. intercept-only
    // mean prediction; the unguarded division would throw under Spark
    // 4's default ANSI mode
    val varX = col("__sxx") - col("__n") * col("__mx") * col("__mx")
    val beta = when(varX === 0.0, 0.0)
      .otherwise((col("__sxy") - col("__n") * col("__mx") * col("__my")) / varX)
    df.crossJoin(broadcast(st))
      .withColumn(out,
        when(t.isNotNull, t).otherwise(
          least(greatest((col("__my") - beta * col("__mx")) + beta * x,
            col("__vmin")), col("__vmax"))))
      .drop("__mx", "__my", "__sxy", "__sxx", "__n", "__vmin", "__vmax")
  }

  /** MICE-style round-robin imputation (missing.py:165-230): initialise
    * missing cells with column means, then for `maxIter` passes refit an
    * OLS of each column's observed values on the mean of the other
    * columns' CURRENT fills and re-predict that column's missing cells
    * (clipped to the observed range). Produces `<col>_imp` columns.
    *
    * Each pass is a handful of hash aggregations; `localCheckpoint`
    * bounds plan growth so the loop scales to wide panels. Spark
    * parallelism replaces the reference's multiprocessing.Pool.
    */
  def iterativeImpute(df: DataFrame, cols: Seq[String], maxIter: Int = 10): DataFrame = {
    val meanAggs = cols.map(c => avg(col(c)).as(s"__mean_$c"))
    var cur = df.crossJoin(broadcast(df.agg(meanAggs.head, meanAggs.tail: _*)))
    for (c <- cols)
      cur = cur.withColumn(s"${c}_imp", coalesce(col(c), col(s"__mean_$c")))
    cur = cur.drop(cols.map(c => s"__mean_$c"): _*)
    for (_ <- 1 to maxIter) {
      for (c <- cols) {
        val others = cols.filterNot(_ == c)
        val predictor = others.map(o => col(s"${o}_imp")).reduce(_ + _) / others.size
        cur = regressionImpute(cur.withColumn("__pred", predictor), c, "__pred", "__fit")
          .withColumn(s"${c}_imp", col("__fit"))
          .drop("__pred", "__fit")
      }
      cur = cur.localCheckpoint(true)
    }
    cur
  }

  /** Deterministic seeded uniform in (0, 1) from the first 8 hex
    * digits of md5 over the `parts` joined with ':' — the same
    * hash-as-RNG device as [[graft.sampling.Sampling.hashKey]], made
    * numeric: conv() of 8 hex digits is an exact integer ≤ 2³², so
    * (v + 0.5)/2³² is reproducible bit-for-bit on any engine that can
    * md5 a string.
    */
  private def hashUniform(parts: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.Column =
    (conv(substring(md5(concat_ws(":", parts: _*)), 1, 8), 16, 10)
      .cast("double") + 0.5) / math.pow(2.0, 32)

  /** Multiple-imputation generator — impute_mice_generator
    * (missing.py:212-230): `nImputations` imputations stacked under an
    * `imputation_id` column. This engine's chain is deterministic, so
    * ONE materialised chain is shared (already localCheckpoint'ed by
    * iterativeImpute — the union branches reuse it instead of
    * recomputing n times) and each imputation adds RESIDUAL-SCALED
    * noise to its null-origin cells: a Box–Muller normal draw, seeded
    * per (row key, column, imputation) through md5 — fully
    * deterministic and engine-reproducible — scaled by the final-pass
    * regression's residual standard deviation √(SSE/(n−2)) and clipped
    * to the observed range like the point predictions. Between-
    * imputation variance therefore approximates the posterior
    * predictive spread of the fitted regression (what Rubin's rules
    * pool), not sklearn's exact per-seed variability — the honest
    * middle of SURVEY §7.3's statistical-parity caveat, replacing the
    * r4/r5 marked-epsilon stand-in.
    *
    * @param keyCols columns forming a stable per-row identity for the
    *   noise seed (default: the panel key)
    */
  def miceGenerator(df: DataFrame, cols: Seq[String],
                    nImputations: Int, maxIter: Int = 10,
                    keyCols: Seq[String] = Seq(graft.Panel.TimeCol, graft.Panel.UnitCol)): DataFrame = {
    val base = iterativeImpute(df, cols, maxIter)
    // final-pass regression stats per column: the predictor is the
    // SAME mean-of-others'-imputations the chain's last pass used, so
    // sd is the residual scale of the model that produced the fills
    val withPred = cols.foldLeft(base) { (d, c) =>
      val others = cols.filterNot(_ == c)
      d.withColumn(s"__pred_$c",
        others.map(o => col(s"${o}_imp")).reduce(_ + _) / others.size)
    }
    val statAggs = cols.flatMap { c =>
      val t = col(c); val x = col(s"__pred_$c"); val o = t.isNotNull
      Seq(
        avg(when(o, x)).as(s"__mx_$c"), avg(when(o, t)).as(s"__my_$c"),
        sum(when(o, x * t)).as(s"__sxy_$c"), sum(when(o, x * x)).as(s"__sxx_$c"),
        sum(when(o, t * t)).as(s"__syy_$c"),
        count(when(o, lit(1))).cast("double").as(s"__n_$c"),
        min(when(o, t)).as(s"__vmin_$c"), max(when(o, t)).as(s"__vmax_$c"))
    }
    val cur = withPred.crossJoin(
      broadcast(withPred.agg(statAggs.head, statAggs.tail: _*)))
    def residSd(c: String) = {
      val (n, mx, my) = (col(s"__n_$c"), col(s"__mx_$c"), col(s"__my_$c"))
      val varX = col(s"__sxx_$c") - n * mx * mx
      val beta = when(varX === 0.0, 0.0)
        .otherwise((col(s"__sxy_$c") - n * mx * my) / varX)
      val sse = col(s"__syy_$c") - n * my * my - beta * beta * varX
      when(n <= 2.0, 0.0).otherwise(sqrt(greatest(sse / (n - 2.0), lit(0.0))))
    }
    val statCols = cols.flatMap(c => Seq(s"__pred_$c", s"__mx_$c", s"__my_$c",
      s"__sxy_$c", s"__sxx_$c", s"__syy_$c", s"__n_$c", s"__vmin_$c", s"__vmax_$c"))
    val runs = (0 until nImputations).map { i =>
      cols.foldLeft(cur.withColumn("imputation_id", lit(i))) { (d, c) =>
        val seed = keyCols.map(col) ++ Seq(lit(c), lit(i.toString))
        val u1 = hashUniform(seed :+ lit("u1"))
        val u2 = hashUniform(seed :+ lit("u2"))
        val z = sqrt(lit(-2.0) * log(u1)) * cos(lit(2.0 * math.Pi) * u2)
        // round the noisy draw to 1e-6: z is a function of log()/cos(),
        // which are NOT bit-identical across libm implementations — the
        // same discipline as tfidfKeywords/bigramLmScore (observed cells
        // carry no transcendentals and stay unrounded)
        d.withColumn(s"${c}_imp",
          when(col(c).isNull,
            round(least(greatest(col(s"${c}_imp") + residSd(c) * z,
              col(s"__vmin_$c")), col(s"__vmax_$c")), 6))
            .otherwise(col(s"${c}_imp")))
      }
    }
    runs.reduce(_ unionByName _).drop(statCols: _*)
  }
}
