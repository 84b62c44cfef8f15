package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass numeric profiling — the dataset-card numbers (count, null
  * count, min/max, mean, median) for any set of numeric columns in a
  * SINGLE aggregation over one scan: every statistic is a partial
  * (map-side combinable) aggregate, so the profile of a 100 TB table
  * costs one pass however many columns ride along. Output is
  * long-format (one row per column), assembled by an in-plan explode
  * of the single stats row.
  *
  * Scale note: the median is the one statistic here whose exact form
  * buffers values (Spark's `percentile` is exact-interpolated — the
  * oracle-checkable choice). At 100 TB swap it for
  * `approx_percentile(c, 0.5, accuracy)` — a mergeable KLL-style
  * sketch with bounded error, the q_length_quantiles_approx
  * discipline; everything else is already O(1)-mergeable.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    // the long-format assembly addresses derived stats by generated
    // name, and col("...") parses '.' as a struct path — keep names
    // simple rather than quoting every generated reference
    require(cols.forall(c => !c.contains(".") && !c.contains("`")),
      s"profile column names must be dot/backtick-free: $cols")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__n_$c"),
        sum(col(c).isNull.cast("long")).as(s"__nulls_$c"),
        round(min(col(c)).cast("double"), 6).as(s"__min_$c"),
        round(max(col(c)).cast("double"), 6).as(s"__max_$c"),
        round(avg(col(c)), 6).as(s"__mean_$c"),
        round(percentile(col(c).cast("double"), lit(0.5)), 6).as(s"__p50_$c"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map { c =>
        struct(lit(c).as("column"),
          col(s"__n_$c").as("n_values"),
          col(s"__nulls_$c").as("n_nulls"),
          col(s"__min_$c").as("min"),
          col(s"__max_$c").as("max"),
          col(s"__mean_$c").as("mean"),
          col(s"__p50_$c").as("p50"))
      }: _*)).as("p"))
      .select(col("p.column").as("column"), col("p.n_values").as("n_values"),
        col("p.n_nulls").as("n_nulls"), col("p.min").as("min"),
        col("p.max").as("max"), col("p.mean").as("mean"),
        col("p.p50").as("p50"))
  }

  /** The 100 TB profile: identical shape, the median via the mergeable
    * `approx_percentile` sketch instead of the value-buffering exact
    * form — emitted WITH an in-plan verdict that the estimate sits
    * within `tolFrac` of (max−min) of the exact median computed in the
    * same pass (the vocab-sketch envelope discipline: the oracle
    * reproduces the exact columns and answers TRUE, so sketch drift
    * hash-mismatches the gate).
    *
    * @return (column, n_values, p50, p50_within_tol)
    */
  def profileApprox(df: DataFrame, cols: Seq[String],
                    accuracy: Int = 10000,
                    tolFrac: Double = 0.01): DataFrame = {
    require(cols.nonEmpty, "profileApprox needs at least one column")
    require(cols.forall(c => !c.contains(".") && !c.contains("`")),
      s"profile column names must be dot/backtick-free: $cols")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__n_$c"),
        round(percentile(col(c).cast("double"), lit(0.5)), 6).as(s"__p50_$c"),
        expr(s"approx_percentile(CAST($c AS DOUBLE), 0.5, $accuracy)")
          .as(s"__ap_$c"),
        (max(col(c)).cast("double") - min(col(c)).cast("double"))
          .as(s"__rng_$c"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map { c =>
        struct(lit(c).as("column"),
          col(s"__n_$c").as("n_values"),
          col(s"__p50_$c").as("p50"),
          (abs(col(s"__ap_$c") - col(s"__p50_$c")) <=
            greatest(col(s"__rng_$c") * tolFrac, lit(1e-9)))
            .as("p50_within_tol"))
      }: _*)).as("p"))
      .select(col("p.column").as("column"), col("p.n_values").as("n_values"),
        col("p.p50").as("p50"), col("p.p50_within_tol").as("p50_within_tol"))
  }

  /** The exact Benford expected shares, inlined as double literals on
    * BOTH engines (a Scala Double's shortest string round-trips, so
    * the SQL literal parses back bit-identical).
    */
  val BenfordExpected: Seq[(Int, Double)] =
    (1 to 9).map(d => d -> math.log10(1.0 + 1.0 / d))

  /** Benford's-law first-digit audit — the classic fraud /
    * data-fabrication screen for naturally-occurring positive
    * magnitudes (prices, populations, transaction amounts): the first
    * significant digit's share vs `log10(1 + 1/d)`, with the
    * chi-square statistic repeated on every row as the table-level
    * verdict.
    *
    * ONE map-side-combinable digit-count aggregate (9-row output); the
    * first digit derives from `ln`-based arithmetic written identically
    * on both engines; expected shares are INLINED literals (computed
    * once here), so no cross-engine log evaluation enters the compare.
    *
    * @return (digit, n, share, expected, dev, chi2) — 9 rows
    */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val digit = least(greatest(
      floor(v / pow(lit(10.0), floor(log(v) / math.log(10.0)))).cast("int"),
      lit(1)), lit(9))
    val counts = df.filter(v > 0.0)
      .select(digit.as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val expected = df.sparkSession
      .createDataFrame(BenfordExpected).toDF("digit", "expected")
    val tot = counts.agg(sum("n").as("__N"))
    val joined = expected
      .join(counts, Seq("digit"), "left").na.fill(0L, Seq("n"))
      .crossJoin(broadcast(tot))
    val share = col("n").cast("double") / col("__N")
    val chiTerm = round(
      (col("n") - col("__N") * col("expected"))
        * (col("n") - col("__N") * col("expected"))
        / (col("__N") * col("expected")), 9)
    joined
      .withColumn("__chi", chiTerm)
      .withColumn("chi2", round(sum(col("__chi")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(pmod(xxhash64(col("digit")), lit(1)))), 6))
      .select(col("digit"), col("n"),
        round(share, 6).as("share"),
        round(col("expected"), 6).as("expected"),
        round(share - col("expected"), 6).as("dev"),
        col("chi2"))
  }
}
