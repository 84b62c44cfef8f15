package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
        // the mean's summands are fixed to exact 1e-6-unit integers
        // (DECIMAL sum) — a corpus-scale float sum is accumulation-
        // order-dependent and its 1e-6 rounding flips with partition
        // layout; the 5e-7 input quantization is far inside the output
        // rounding. Bounds: |value| ≤ ~9e12 before the long overflows.
        round(sum(round(col(c) * 1e6).cast("long").cast("decimal(38,0)"))
          .cast("double") / count(col(c)) / 1e6, 6).as(s"__mean_$c"),
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
          .partitionBy(graft.plans.PlanLint.kBoundedKey(col("digit")))), 6))
      .select(col("digit"), col("n"),
        round(share, 6).as("share"),
        round(col("expected"), 6).as("expected"),
        round(share - col("expected"), 6).as("dev"),
        col("chi2"))
  }

  /** k-anonymity audit — the privacy screen a training-data release
    * runs before shipping: group the table by its quasi-identifier
    * columns and flag every equivalence class smaller than `k` (those
    * rows are re-identifiable by joining the quasi-identifiers against
    * an external dataset).
    *
    * ONE map-side-combinable count aggregate; output is one row per
    * quasi-identifier combination (bounded by the identifier domain
    * product, not the table), with the class size, its share of the
    * table, and the at-risk verdict. The 1-row total broadcasts into
    * the projection.
    *
    * @return (quasi..., n, share, at_risk)
    */
  /** l-diversity audit — the companion screen to [[kAnonymity]]: a
    * k-anonymous class is still disclosive when every row in it shares
    * one SENSITIVE value (the homogeneity attack), so each
    * quasi-identifier class is additionally graded on how many
    * distinct sensitive values it carries.
    *
    * ONE grouped aggregate: `count` plus exact `count(distinct
    * sensitive)` per class — Spark plans the distinct as the standard
    * two-phase expand/partial-merge aggregate, map-side combinable, so
    * the pass stays one shuffle bounded by (class × sensitive)
    * cardinality, never table rows.
    *
    * @return (quasi..., n, distinct_sensitive, at_risk)
    */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(l >= 2L, s"l must be >= 2, got $l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("distinct_sensitive"))
      .select(quasiCols.map(col) :+
        col("n") :+ col("distinct_sensitive") :+
        (col("distinct_sensitive") < l).as("at_risk"): _*)
  }

  /** t-closeness audit — the third privacy screen after [[kAnonymity]]
    * and [[lDiversity]]: a class whose sensitive-value DISTRIBUTION
    * diverges from the table-wide one leaks attribute information even
    * when it is k-anonymous and l-diverse (the skewness attack). For a
    * categorical sensitive attribute the earth-mover distance reduces
    * to total variation: t(class) = ½·Σ_s |p_class(s) − p_global(s)|.
    *
    * Exactness: all masses come from one (class, sensitive) cell count
    * (bounded by cardinality products, map-side combinable); the class
    * rows are densified against the global sensitive margin first so a
    * value absent from a class still contributes its global share; per
    * cell the |p−q| term is fixed to 1e-9 integers before the per-class
    * sum — partition-layout-proof like every gate statistic.
    *
    * @return (quasi..., n, tvd, at_risk) — at_risk when tvd > t
    */
  def tCloseness(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, t: Double): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(t > 0.0 && t < 1.0, s"t must be in (0, 1), got $t")
    val cells = df.groupBy((quasiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("__o"))
    val classTot = cells.groupBy(quasiCols.map(col): _*)
      .agg(sum(col("__o")).as("__nc"))
    val sensTot = cells.groupBy(col(sensitiveCol))
      .agg(sum(col("__o")).as("__gs"))
    val tot = cells.agg(sum(col("__o")).as("__n"))
    val term = abs(col("__o") / col("__nc") -
      col("__gs").cast("double") / col("__n"))
    classTot.crossJoin(broadcast(sensTot))
      .join(cells, quasiCols :+ sensitiveCol, "left")
      .na.fill(0L, Seq("__o"))
      .crossJoin(broadcast(tot))
      .select(quasiCols.map(col) :+ col("__nc") :+
        round(term * 1e9).cast("long").as("__t9"): _*)
      .groupBy((quasiCols.map(col) :+ col("__nc").as("n")): _*)
      .agg(round(sum(col("__t9")).cast("double") / 2e9, 6).as("tvd"))
      .select(quasiCols.map(col) :+ col("n") :+ col("tvd") :+
        (round(col("tvd") - t, 6) > 0.0).as("at_risk"): _*)
  }

  /** Categorical DIVERSITY index — how evenly a mixture spreads across
    * its categories (sources, languages, labels): Shannon entropy H
    * (nats), Pielou evenness H/ln k (1 = perfectly balanced), and the
    * Simpson concentration Σp² (the probability two random rows share
    * the category — the Gini–Simpson complement). The one-row health
    * check of any q_mix_* recipe.
    *
    * Exactness: one category-count aggregation; each −p·ln p term is
    * fixed to 1e-9 integers (the mutualInfo discipline), Simpson is an
    * exact Σc²/n² integer ratio, evenness divides the already-rounded
    * H by ln k once.
    *
    * @return one row (k, n, shannon, evenness, simpson)
    */
  def diversityIndex(df: DataFrame, catCol: String): DataFrame = {
    val d = "decimal(38,0)"
    val counts = df.groupBy(col(catCol).as("__c"))
      .agg(count(lit(1)).as("__o"))
    val tot = counts.agg(sum(col("__o")).as("__n"),
      count(lit(1)).as("__k"))
    counts.crossJoin(broadcast(tot))
      .select(col("__n"), col("__k"),
        round((col("__o") / col("__n")) *
          log(col("__o").cast("double") / col("__n")) * -1e9).cast("long")
          .as("__h9"),
        (col("__o").cast(d) * col("__o")).as("__o2"))
      .groupBy(col("__k").as("k"), col("__n").as("n"))
      .agg(round(sum(col("__h9")).cast("double") / 1e9, 6).as("shannon"),
        sum(col("__o2")).as("__s2"))
      .select(col("k"), col("n"), col("shannon"),
        when(col("k") <= 1, lit(null).cast("double"))
          .otherwise(round(col("shannon") / log(col("k").cast("double")), 6))
          .as("evenness"),
        round(col("__s2").cast("double") /
          (col("n").cast(d) * col("n")).cast("double"), 6).as("simpson"))
  }

  /** Gini concentration coefficient of a monetary value across units
    * (customers, suppliers, sources) — the inequality audit a revenue
    * or token-budget review reports: 0 = perfectly even, →1 = all
    * mass on one unit.
    *
    * Exactness: values are fixed to integer cents BEFORE any
    * aggregation (`round(v·100)` per row — `valueCol` is expected to
    * carry ≤2 decimals, the money convention), so the per-unit sums
    * are exact BIGINTs whatever the partition order, and the closed
    * form
    *   G = (2·Σ rank·x − (n+1)·Σx) / (n·Σx)
    * (x ascending, rank 1..n) divides one exactly-computed DECIMAL by
    * another — engine-independent to the last bit before the 1e-6
    * output rounding. The rank is [[graft.ops.Ranking.rank]] (range
    * partition + offsets, no single-task window), rank·x and the
    * final sums ride DECIMAL(38,0) so a 1e9-unit × 1e9-cent corpus
    * cannot overflow.
    *
    * @return one row: (n_units, total, gini)
    */
  def gini(df: DataFrame, valueCol: String, unitCol: String): DataFrame = {
    val cents = df.groupBy(col(unitCol).as("__u"))
      .agg(sum(round(col(valueCol) * 100).cast("long")).as("__x"))
    // Σ rank·x through the single-branch rankDot (r15): gini only
    // consumes the rank-weighted SUM, so the per-row rank join
    // (eager checkpoint + broadcast join) was pure overhead — one
    // linear pass computes the identical exact integers with no
    // materialization of the working set at any scale.
    graft.ops.Ranking.rankDot(cents, Seq(col("__x"), col("__u")), "__x")
      .select(coalesce(col("__n"), lit(0L)).as("n_units"),
        col("__sx").as("__t"), col("__srx").as("__s1"))
      .select(col("n_units"),
        round(col("__t").cast("double") / 100, 6).as("total"),
        when(col("__t") === 0, lit(null).cast("double"))
          .otherwise(round(
            (lit(2) * col("__s1") - (col("n_units") + 1) * col("__t"))
              .cast("double") /
            (col("n_units") * col("__t")).cast("double"), 6)).as("gini"))
  }

  /** Per-column distinct-cardinality profile: exact count-distinct
    * next to the mergeable HLL++ estimate, emitted with the envelope
    * verdict (the q_vocab_approx discipline — at 100 TB the sketch is
    * the only viable path, and this row keeps its error gated). One
    * aggregation carries every column.
    *
    * @return (column, n_distinct, within_5pct) long-format
    */
  def distinctProfile(df: DataFrame, cols: Seq[String],
                      relErr: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "distinctProfile needs at least one column")
    require(cols.forall(c => !c.contains(".") && !c.contains("`")),
      s"distinctProfile column names must be dot/backtick-free: $cols")
    // The exact counts and the HLL sketches run as TWO aggregations
    // (r15). Mixing countDistinct with approx_count_distinct in ONE
    // agg made Catalyst's multi-distinct Expand rewrite attach every
    // column's partial HLL buffer (4 × 52 longs) to EVERY
    // (distinct-value, gid) group: sketches were built per distinct
    // key and shuffled in a 213-column exchange, then all but the
    // gid=0 group's thrown away by the first(...) FILTER — measured
    // as the whole cost of q_distinct_profile. Split, the exact pass
    // shuffles narrow (value, gid) rows only and the approx pass
    // keeps 4 sketches per PARTITION, merged once; at corpus scale
    // that is the difference between an HLL per distinct value and an
    // HLL per partition crossing the wire. HLL register merge is a
    // bitwise max — order-independent — and countDistinct is
    // untouched, so both emitted numbers are bit-identical.
    val exact = df.agg(
      countDistinct(col(cols.head)).as(s"__d_${cols.head}"),
      cols.tail.map(c => countDistinct(col(c)).as(s"__d_$c")): _*)
    val approx = df.agg(
      approx_count_distinct(col(cols.head)).as(s"__a_${cols.head}"),
      cols.tail.map(c => approx_count_distinct(col(c)).as(s"__a_$c")): _*)
    exact.crossJoin(broadcast(approx))
      .select(explode(array(cols.map { c =>
        struct(lit(c).as("column"), col(s"__d_$c").as("n_distinct"),
          (abs(col(s"__a_$c") - col(s"__d_$c")).cast("double") <=
            greatest(col(s"__d_$c").cast("double") * relErr, lit(1.0)))
            .as("within_5pct"))
      }: _*)).as("p"))
      .select(col("p.column").as("column"),
        col("p.n_distinct").as("n_distinct"),
        col("p.within_5pct").as("within_5pct"))
  }

  /** Categorical dataset-card: the top-`k` most frequent values per
    * column with counts, corpus share, and rank — the categorical
    * complement of [[profile]]'s numeric moments. Per column: one
    * value-keyed count aggregation (bounded by that column's
    * cardinality) and a TakeOrderedAndProject top-k (per-partition
    * heaps, never a global sort); the k-row rank window is bounded by
    * construction. NULL prints as `<null>` so both engines order it
    * identically.
    *
    * @return (column, value, n, share, value_rank) long-format
    */
  def topValues(df: DataFrame, cols: Seq[String], k: Int = 5): DataFrame = {
    require(cols.nonEmpty && k >= 1, "topValues needs columns and k >= 1")
    val tot = df.agg(count(lit(1)).as("__tot"))
    cols.map { c =>
      val top = df
        .groupBy(coalesce(col(c).cast("string"), lit("<null>")).as("value"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("value")).limit(k)
      top.crossJoin(broadcast(tot))
        .withColumn("value_rank", row_number().over(
          Window.partitionBy(graft.plans.PlanLint.kBoundedKey(col("n")))
            .orderBy(col("n").desc, col("value"))).cast("long"))
        .select(lit(c).as("column"), col("value"), col("n"),
          round(col("n").cast("double") / col("__tot"), 6).as("share"),
          col("value_rank"))
    }.reduce(_.unionByName(_))
  }

  /** Pareto concentration curve — the "top 20% of customers carry x%
    * of revenue" audit that complements [[gini]]'s single number with
    * the full decile breakdown. Per-unit values are fixed to exact
    * integer cents (the gini discipline) so every sum is an exact
    * BIGINT; units are binned into `buckets` equal-population bins by
    * descending value (exact global ntile — range partition + offsets,
    * no single-task window); shares divide exact longs and round 1e-6.
    *
    * @return (bucket, n_units, bucket_value, value_share,
    *         cum_value_share) — bucket 1 = the highest-value units.
    */
  def paretoShare(df: DataFrame, valueCol: String, unitCol: String,
                  buckets: Int = 10): DataFrame = {
    val cents = df.groupBy(col(unitCol).as("__u"))
      .agg(sum(round(col(valueCol) * 100).cast("long")).as("__x"))
    val binned = graft.ops.Ranking.globalNtile(cents,
      Seq(col("__x").desc, col("__u")), buckets, "bucket")
    val perBin = binned.groupBy(col("bucket").cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_units"), sum(col("__x")).as("__v"))
    // buckets rows from here on — the constant-key window is bounded
    val w = Window.partitionBy(graft.plans.PlanLint.kBoundedKey(col("bucket")))
      .orderBy(col("bucket"))
    perBin
      .withColumn("__tot", sum(col("__v")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("__cum", sum(col("__v")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("bucket"), col("n_units"),
        round(col("__v").cast("double") / 100, 6).as("bucket_value"),
        round(col("__v").cast("double") / col("__tot"), 6).as("value_share"),
        round(col("__cum").cast("double") / col("__tot"), 6)
          .as("cum_value_share"))
  }

  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 2L, s"k must be >= 2, got $k")
    val classes = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
    val tot = classes.agg(sum("n").as("__N"))
    classes.crossJoin(broadcast(tot))
      .select(quasiCols.map(col) :+
        col("n") :+
        round(col("n").cast("double") / col("__N"), 6).as("share") :+
        (col("n") < k).as("at_risk"): _*)
  }
}
