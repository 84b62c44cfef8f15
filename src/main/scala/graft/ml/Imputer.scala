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

  /** Multiple-imputation generator — impute_mice_generator
    * (missing.py:212-230): `nImputations` imputations stacked under an
    * `imputation_id` column. This engine's chain is fully deterministic
    * (no per-seed randomisation to replicate), so ONE materialised
    * chain is shared and each imputation applies a deterministic
    * per-chain perturbation to its null-origin cells — a stand-in for
    * (not a replication of) sklearn's per-seed variability: the
    * between-imputation variance here is the marked epsilon, not an
    * uncertainty estimate (SURVEY §7.3's statistical-parity caveat).
    */
  def miceGenerator(df: DataFrame, cols: Seq[String],
                    nImputations: Int, maxIter: Int = 10): DataFrame = {
    // the chain itself is deterministic, so every imputation shares ONE
    // base run (already localCheckpoint'ed by iterativeImpute — the
    // union branches reuse the materialised result instead of
    // recomputing the chain n times); chains differ only in the
    // per-chain perturbation below
    val base = iterativeImpute(df, cols, maxIter)
    val runs = (0 until nImputations).map { i =>
      // perturb the chain: shift each imputed value by a tiny
      // chain-indexed epsilon of its magnitude (keeps chains distinct
      // and deterministic without a random source)
      val eps = i * 1e-6
      cols.foldLeft(base.withColumn("imputation_id", lit(i))) { (d, c) =>
        d.withColumn(s"${c}_imp",
          when(col(c).isNull, col(s"${c}_imp") * (1.0 + eps))
            .otherwise(col(s"${c}_imp")))
      }
    }
    runs.reduce(_ unionByName _)
  }
}
