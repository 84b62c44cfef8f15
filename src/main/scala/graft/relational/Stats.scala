package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classical statistical tests and summaries at aggregation scale —
  * the companions of [[Profile]] (moments), [[Experiment]] (two-
  * proportion z) and [[graft.sampling.Sampling]] (KS): every statistic
  * here reduces to exact integer sufficient statistics in ONE pass
  * (map-side combinable), with floats appearing only in the final
  * closed form — the layout-proof discipline the gate demands.
  */
object Stats {

  private val Dec = "decimal(38,0)"

  /** Pearson chi-square test of independence between two categoricals.
    * One (a, b) cell aggregation (bounded by the category-cardinality
    * product — categorical columns by assumption), margins derived
    * from the cells in-plan; each cell's (obs−exp)²/exp term is fixed
    * to 1e-9 integers before the final sum.
    *
    * @param critical the chi-square critical value for the caller's
    *   dof and significance level (no engine ships the inverse CDF;
    *   the Benford discipline: inline the published constant)
    * @return one row (n, dof, chi2, significant)
    */
  def chi2Test(df: DataFrame, colA: String, colB: String,
               critical: Double): DataFrame = {
    val cells = df.groupBy(col(colA).as("__a"), col(colB).as("__b"))
      .agg(count(lit(1)).as("__o"))
    val rowTot = cells.groupBy("__a").agg(sum(col("__o")).as("__ra"))
    val colTot = cells.groupBy("__b").agg(sum(col("__o")).as("__cb"))
    val tot = cells.agg(sum(col("__o")).as("__n"),
      countDistinct(col("__a")).as("__ka"),
      countDistinct(col("__b")).as("__kb"))
    val exp = col("__ra").cast("double") * col("__cb") / col("__n")
    val term = (col("__o") - exp) * (col("__o") - exp) / exp
    // densify to the full ka×kb table first: an UNOBSERVED cell still
    // contributes (0 − exp)²/exp = exp — dropping empties understates
    // the statistic exactly when dependence is strongest
    rowTot.crossJoin(broadcast(colTot))
      .join(cells, Seq("__a", "__b"), "left")
      .na.fill(0L, Seq("__o"))
      .crossJoin(broadcast(tot))
      .select(col("__n"), col("__ka"), col("__kb"),
        round(term * 1e9).cast("long").as("__t9"))
      .groupBy(col("__n").as("n"),
        ((col("__ka") - 1) * (col("__kb") - 1)).as("dof"),
        least(col("__ka"), col("__kb")).as("__mindim"))
      .agg(round(sum(col("__t9")).cast("double") / 1e9, 6).as("chi2"))
      .select(col("n"), col("dof"), col("chi2"),
        // Cramér's V effect size from the already-rounded statistic
        round(sqrt(col("chi2") /
          (col("n") * (col("__mindim") - 1))), 6).as("cramers_v"),
        (round(col("chi2") - critical, 6) > 0.0).as("significant"))
  }

  /** Pairwise Pearson correlation of numeric columns in ONE
    * aggregation pass: per pair, the five sufficient statistics ride
    * exact 1e-6-unit integer sums (DECIMAL(38,0) — products of two
    * 1e-6-fixed values are 1e-12-unit integers), and
    *   r = (n·Sxy − Sx·Sy) / √((n·Sxx − Sx²)(n·Syy − Sy²))
    * divides one exactly-computed DECIMAL by another. Output is
    * long-format (col_a, col_b, corr) for a < b, assembled by an
    * in-plan explode of the single stats row — the [[Profile]] shape.
    * Bounds: |value| ≤ ~9e12 before the 1e-6 fixing overflows a long.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "corrMatrix needs at least two columns")
    require(cols.forall(c => !c.contains(".") && !c.contains("`")),
      s"corrMatrix column names must be dot/backtick-free: $cols")
    val fixed = df.select(cols.map(c =>
      round(col(c) * 1e6).cast("long").as(s"__i_$c")): _*)
    val pairs = for {
      (a, i) <- cols.zipWithIndex; b <- cols.drop(i + 1)
    } yield (a, b)
    val aggs = count(lit(1)).as("__n") +:
      cols.map(c => sum(col(s"__i_$c").cast(Dec)).as(s"__s_$c")) ++:
      cols.map(c => sum(col(s"__i_$c").cast(Dec) * col(s"__i_$c"))
        .as(s"__q_$c")) ++:
      pairs.map { case (a, b) =>
        sum(col(s"__i_$a").cast(Dec) * col(s"__i_$b")).as(s"__x_${a}_$b")
      }
    val stats = fixed.agg(aggs.head, aggs.tail: _*)
    val n = col("__n").cast(Dec)
    stats.select(explode(array(pairs.map { case (a, b) =>
        val num = (n * col(s"__x_${a}_$b") - col(s"__s_$a") * col(s"__s_$b"))
          .cast("double")
        val da = (n * col(s"__q_$a") - col(s"__s_$a") * col(s"__s_$a"))
          .cast("double")
        val db = (n * col(s"__q_$b") - col(s"__s_$b") * col(s"__s_$b"))
          .cast("double")
        struct(lit(a).as("col_a"), lit(b).as("col_b"),
          when(da <= 0.0 || db <= 0.0, lit(null).cast("double"))
            .otherwise(round(num / sqrt(da * db), 6)).as("corr"))
      }: _*)).as("p"))
      .select(col("p.col_a").as("col_a"), col("p.col_b").as("col_b"),
        col("p.corr").as("corr"))
  }

  /** Mutual information between two categoricals (nats), with marginal
    * entropies and the normalized score MI/√(H_a·H_b) — the effect-size
    * companion of [[chi2Test]] that also reads as "how many nats does
    * knowing A tell you about B" (feature-selection's filter statistic).
    * Only observed cells contribute (the p·ln p limit at 0 is 0, so no
    * densify); every term is fixed to 1e-9 integers before its sum.
    *
    * @return one row (n, mi, h_a, h_b, nmi)
    */
  def mutualInfo(df: DataFrame, colA: String, colB: String): DataFrame = {
    val cells = df.groupBy(col(colA).as("__a"), col(colB).as("__b"))
      .agg(count(lit(1)).as("__o"))
    val rowTot = cells.groupBy("__a").agg(sum(col("__o")).as("__ra"))
    val colTot = cells.groupBy("__b").agg(sum(col("__o")).as("__cb"))
    val tot = cells.agg(sum(col("__o")).as("__n"))
    def ent(m: DataFrame, c: String) = m.crossJoin(broadcast(tot))
      .select(round((col(c) / col("__n")) *
        log(col(c).cast("double") / col("__n")) * -1e9).cast("long")
        .as("__t9"))
      .agg(round(sum(col("__t9")).cast("double") / 1e9, 6).as("h"))
    val miTerm = (col("__o") / col("__n")) *
      log(col("__o").cast("double") * col("__n") /
        (col("__ra").cast("double") * col("__cb")))
    val mi = cells
      .join(broadcast(rowTot), "__a")
      .join(broadcast(colTot), "__b")
      .crossJoin(broadcast(tot))
      .select(col("__n"), round(miTerm * 1e9).cast("long").as("__t9"))
      .groupBy(col("__n").as("n"))
      .agg(round(sum(col("__t9")).cast("double") / 1e9, 6).as("mi"))
    mi.crossJoin(broadcast(ent(rowTot, "__ra").select(col("h").as("h_a"))))
      .crossJoin(broadcast(ent(colTot, "__cb").select(col("h").as("h_b"))))
      .select(col("n"), col("mi"), col("h_a"), col("h_b"),
        when(col("h_a") <= 0.0 || col("h_b") <= 0.0,
          lit(null).cast("double"))
          .otherwise(round(col("mi") / sqrt(col("h_a") * col("h_b")), 6))
          .as("nmi"))
  }

  /** Welch's unequal-variance t-test between two groups of a numeric
    * (money-convention) metric — the continuous-metric companion of
    * [[Experiment.abTest]]'s two-proportion z. Means and variances
    * derive from exact integer-cent sums (one pass, two 1-row
    * aggregates); the t statistic and Welch–Satterthwaite dof are
    * closed forms over them. Large-sample significance compares |t|
    * to the caller's critical value (1.96 at α=0.05 — the inlined-
    * constant discipline).
    *
    * @return one row (n_a, n_b, mean_a, mean_b, t, dof, significant)
    */
  def welchT(a: DataFrame, b: DataFrame, valueCol: String,
             critical: Double = 1.96): DataFrame = {
    def stats(df: DataFrame, tag: String) =
      df.select(round(col(valueCol) * 100).cast("long").as("__c"))
        .agg(count(lit(1)).as(s"n_$tag"),
          sum(col("__c").cast(Dec)).as(s"__s_$tag"),
          sum(col("__c").cast(Dec) * col("__c")).as(s"__q_$tag"))
    def m(t: String) =
      col(s"__s_$t").cast("double") / col(s"n_$t") / 100.0
    // unbiased sample variance from the exact sums, in dollars²
    def v(t: String) =
      (col(s"n_$t").cast(Dec) * col(s"__q_$t")
        - col(s"__s_$t") * col(s"__s_$t")).cast("double") /
        col(s"n_$t") / (col(s"n_$t") - 1) / 1e4
    val se2a = v("a") / col("n_a")
    val se2b = v("b") / col("n_b")
    val t = (m("a") - m("b")) / sqrt(se2a + se2b)
    val dof = (se2a + se2b) * (se2a + se2b) /
      (se2a * se2a / (col("n_a") - 1) + se2b * se2b / (col("n_b") - 1))
    stats(a, "a").crossJoin(broadcast(stats(b, "b")))
      .select(col("n_a"), col("n_b"),
        round(m("a"), 6).as("mean_a"), round(m("b"), 6).as("mean_b"),
        round(t, 6).as("t"), round(dof, 6).as("dof"),
        (round(abs(t) - critical, 6) > 0.0).as("significant"))
  }

  /** Equi-width histogram: `nbins` fixed-width bins between the exact
    * global min and max (order-independent aggregates), bin assignment
    * row-local, one bin-keyed count — the one-pass distribution sketch
    * every profiling dashboard starts from ([[Profile]] gives moments,
    * this gives shape). Values at the max land in the last bin.
    *
    * @return (bin, lo, hi, n) — lo/hi rounded 1e-6
    */
  def histogram(df: DataFrame, valueCol: String, nbins: Int): DataFrame = {
    require(nbins >= 1, s"nbins must be >= 1, got $nbins")
    val ext = df.agg(min(col(valueCol).cast("double")).as("__mn"),
      max(col(valueCol).cast("double")).as("__mx"))
    val width = (col("__mx") - col("__mn")) / nbins
    val bin = when(col("__mx") === col("__mn"), lit(0L))
      .otherwise(least(
        floor((col(valueCol).cast("double") - col("__mn")) / width),
        lit(nbins - 1L)).cast("long"))
    val w2 = (col("__mx") - col("__mn")) / nbins
    df.crossJoin(broadcast(ext))
      .select(bin.as("bin"), col("__mn"), col("__mx"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), first(col("__mn")).as("__mn"),
        first(col("__mx")).as("__mx"))
      .select(col("bin"),
        round(col("__mn") + col("bin") * w2, 6).as("lo"),
        round(col("__mn") + (col("bin") + 1) * w2, 6).as("hi"),
        col("n"))
  }

  /** One-way ANOVA F-test: does a numeric (money-convention) metric
    * differ across k groups — the k-group generalisation of [[welchT]].
    * Two passes in the [[trimmedMean]] shape: exact integer-cent group
    * sums give each group mean (rounded 1e-9 — the cusum discipline,
    * so the subtraction base is partition-layout-proof), then the
    * within/between sums of squares accumulate per-row / per-group
    * squared deviations fixed to 1e-2-unit integers (dollars², so
    * |term·100| stays < 2⁵³ up to ~sf1 within-group; the between terms
    * use 1e0 units for the same headroom) — every float the engines
    * sum is an exact integer, whatever the partition order.
    *
    * @param critical the F critical value for the caller's dof at the
    *   chosen significance (inlined-constant discipline — no engine
    *   ships the inverse F CDF)
    * @return one row (n, k, ss_between, ss_within, f, significant)
    */
  def anovaF(df: DataFrame, groupCol: String, valueCol: String,
             critical: Double): DataFrame = {
    val g = df.select(col(groupCol).as("__g"),
      round(col(valueCol) * 100).cast("long").as("__c"))
    val means = g.groupBy("__g")
      .agg(count(lit(1)).as("__ng"), sum(col("__c").cast(Dec)).as("__sg"))
      .select(col("__g"), col("__ng"),
        round(col("__sg").cast("double") / col("__ng") / 100.0, 9)
          .as("__mg"))
    val grand = g
      .agg(count(lit(1)).as("__n"), sum(col("__c").cast(Dec)).as("__s"))
      .select(col("__n"),
        round(col("__s").cast("double") / col("__n") / 100.0, 9)
          .as("__mu"))
    val dev = col("__c").cast("double") / 100.0 - col("__mg")
    val ssw = g.join(broadcast(means), "__g")
      .select(round(dev * dev * 100).cast("long").cast(Dec).as("__w2"))
      .agg(sum(col("__w2")).as("__ssw2"))
    val bdev = col("__mg") - col("__mu")
    val ssb = means.crossJoin(broadcast(grand))
      .select(round(col("__ng") * bdev * bdev).cast(Dec).as("__b0"))
      .agg(sum(col("__b0")).as("__ssb0"), count(lit(1)).as("__k"))
    // the 1e-2/1e0 fixing scales cancel inside each ratio term
    val f = (col("__ssb0").cast("double") / (col("__k") - 1)) /
      (col("__ssw2").cast("double") / 100.0 / (col("__n") - col("__k")))
    grand.crossJoin(broadcast(ssw)).crossJoin(broadcast(ssb))
      .select(col("__n").as("n"), col("__k").as("k"),
        round(col("__ssb0").cast("double"), 6).as("ss_between"),
        round(col("__ssw2").cast("double") / 100.0, 6).as("ss_within"),
        round(f, 6).as("f"),
        (round(f - critical, 6) > 0.0).as("significant"))
  }

  /** Spearman rank correlation between two numeric
    * columns — the monotone-association companion of [[corrMatrix]]'s
    * Pearson (robust to outliers and nonlinear-but-monotone links).
    *
    * Exactness: instead of per-row ranks (a data-sized global window),
    * everything derives from the joint (a, b) contingency cells: the
    * margin tables carry each value's tie-averaged rank DOUBLED so it
    * stays an integer (2·r̄(v) = 2·cum≤(v) − n_v + 1 — the [[graft.ml.Eval]]
    * half-rank doubling), and Pearson's five sufficient statistics
    * over the doubled ranks are cell-count-weighted exact DECIMAL
    * sums. Floats appear only in the final closed form.
    *
    * Scale shape: each margin's cumulative count rides
    * [[graft.ops.Ranking.globalCumsum]] — range partition + bounded
    * per-partition offsets — so a CONTINUOUS column (margin ≈ row
    * count) ranks fully parallel; no single-task window, no broadcast
    * of the margin (the rank join keys on the value — AQE broadcasts
    * it when small, shuffles when not).
    *
    * @return one row (n, rho)
    */
  def spearman(df: DataFrame, colA: String, colB: String): DataFrame = {
    // r15: persisted — the cell table feeds both margins' cumsum
    // checkpoints and the final rank join (three full re-executions
    // of the source scan + exchange before)
    val cells = graft.OpCache.persist(
      df.groupBy(col(colA).as("__a"), col(colB).as("__b"))
        .agg(count(lit(1)).as("__o")))
    def ranks(c: String, r2: String) = {
      val m = cells.groupBy(col(c)).agg(sum(col("__o")).as("__nv"))
      graft.ops.Ranking.globalCumsum(m, Seq(col(c)), "__nv", "__cumv")
        .select(col(c), (lit(2) * col("__cumv") - col("__nv") + 1).as(r2))
    }
    val withRanks = cells
      .join(ranks("__a", "__ra"), "__a")
      .join(ranks("__b", "__rb"), "__b")
    val o = col("__o").cast(Dec)
    val s = withRanks.agg(sum(col("__o")).as("__n"),
      sum(o * col("__ra")).as("__sx"), sum(o * col("__rb")).as("__sy"),
      sum(o * col("__ra") * col("__ra")).as("__sxx"),
      sum(o * col("__rb") * col("__rb")).as("__syy"),
      sum(o * col("__ra") * col("__rb")).as("__sxy"))
    val n = col("__n").cast(Dec)
    val num = (n * col("__sxy") - col("__sx") * col("__sy")).cast("double")
    val dx = (n * col("__sxx") - col("__sx") * col("__sx")).cast("double")
    val dy = (n * col("__syy") - col("__sy") * col("__sy")).cast("double")
    s.select(col("__n").as("n"),
      when(dx <= 0.0 || dy <= 0.0, lit(null).cast("double"))
        .otherwise(round(num / sqrt(dx * dy), 6)).as("rho"))
  }

  /** Exact interpolated global quantiles WITHOUT the single-buffer
    * `percentile` aggregate: the exact global rank (range partition +
    * offsets — [[graft.ops.Ranking.globalRank]], no single-task
    * window, no per-group value buffer) locates each quantile's two
    * bracketing order statistics, and the standard type-7 linear
    * interpolation v_lo + (v_hi − v_lo)·frac — the SAME formula Spark
    * `percentile` and DuckDB `quantile_cont` implement — combines
    * them. This is the 100 TB path: the data-sized work is one range
    * exchange; the quantile extraction touches ≤ 2·|qs| rows.
    * Duplicate values get arbitrary-but-distinct consecutive ranks,
    * which is harmless: any duplicate at the bracket rank carries the
    * same value.
    *
    * @return one row per q: (q, value)
    */
  def exactQuantiles(df: DataFrame, valueCol: String,
                     qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must be in [0, 1]: $qs")
    val spark = df.sparkSession
    import spark.implicits._
    val ranked = graft.ops.Ranking.globalRank(
      df.select(col(valueCol).cast("double").as("__v"))
        .filter(col("__v").isNotNull && !isnan(col("__v"))),
      Seq(col("__v")), "__r")
    val qdf = qs.toDF("q")
    val pos = (col("__total") - 1).cast("double") * col("q")
    val lo = (floor(pos) + 1).cast("long")
    val hi = (ceil(pos) + 1).cast("long")
    ranked.join(broadcast(qdf), col("__r") === lo || col("__r") === hi)
      .groupBy(col("q"))
      .agg(min(when(col("__r") === lo, col("__v"))).as("__lo"),
        min(when(col("__r") === hi, col("__v"))).as("__hi"),
        max(pos).as("__pos"))
      .select(col("q"),
        (col("__lo") + (col("__hi") - col("__lo")) *
          (col("__pos") - floor(col("__pos")))).as("value"))
  }

  /** Quantile SKETCH gate — the production `approx_percentile` path
    * checked against [[exactQuantiles]] in one result (the
    * q_vocab_approx envelope discipline): per requested q the row
    * carries the EXACT value (oracle-checkable) plus a verdict that
    * the sketch value's exact RANK sits within `eps`·n of the target
    * position — rank error is what the KLL/GK sketch actually bounds,
    * so a sketch regression flips the verdict and hash-mismatches the
    * gate while machine-specific sketch internals never enter the
    * comparison.
    *
    * @return one row per q: (q, value, within_eps)
    */
  def quantileSketchGate(df: DataFrame, valueCol: String, qs: Seq[Double],
                         accuracy: Int = 10000,
                         eps: Double = 0.01): DataFrame = {
    // r15: three full consumers of the value column (exact quantiles,
    // the sketch aggregation, the rank-audit scan) used to re-execute
    // the caller's lineage three times — project the double column
    // once, persist narrow, scan the source ONCE (the
    // equiDepthHistogram pattern; results bit-identical: same
    // expressions over the same values)
    val vals = graft.OpCache.persist(
      df.select(col(valueCol).cast("double").as("__v")))
    val exact = exactQuantiles(vals, "__v", qs)
    val approx = vals.agg(expr(
      s"approx_percentile(__v, " +
        s"array(${qs.mkString(",")}), $accuracy)").as("__aq"),
      count(col("__v")).as("__n"))
    val aRows = approx.select(col("__n"),
      posexplode(col("__aq")).as(Seq("__i", "__a")))
      .select((element_at(
        array(qs.map(lit): _*), (col("__i") + 1).cast("int"))).as("q"),
        col("__a"), col("__n"))
    val ranks = vals.filter(col("__v").isNotNull)
      .crossJoin(broadcast(aRows))
      .groupBy(col("q"), col("__n"))
      .agg(sum(when(col("__v") <= col("__a"), 1L).otherwise(0L)).as("__r"))
    val target = (col("__n") - 1).cast("double") * col("q") + 1.0
    exact.join(ranks.select(col("q"),
        (abs(col("__r") - target) <= col("__n") * eps + 1.0)
          .as("within_eps")), "q")
      .select(col("q"), round(col("value"), 6).as("value"),
        col("within_eps"))
  }

  /** Equi-DEPTH histogram: `nbins` quantile bins — the shape sketch
    * for skewed distributions where [[histogram]]'s fixed widths dump
    * everything into one bar. Bin boundaries are the [[exactQuantiles]]
    * interior percentiles (distributed rank, never a value buffer;
    * broadcast back 1-row); a row's bin is the count of boundaries
    * strictly below it (values AT a boundary go left), so assignment
    * is row-local and the only aggregation is the bin-keyed count.
    * Boundary determinism: an interpolated percentile falls strictly
    * between data values and an exact-index percentile IS a data value
    * in both engines, so `v > q` never straddles engines.
    *
    * @return (bin, q_lo, q_hi, n) — q_lo/q_hi rounded 1e-6; the outer
    *   bounds are the exact min/max
    */
  def equiDepthHistogram(df: DataFrame, valueCol: String,
                         nbins: Int): DataFrame = {
    require(nbins >= 2, s"nbins must be >= 2, got $nbins")
    val qs = (1 until nbins).map(_.toDouble / nbins)
    // r15: the separate min/max bounds scan is GONE — binning is
    // monotone in the value, so the global min is the per-bin min of
    // bin 0 and the global max is the per-bin max of the top bin
    // (NaN sorts above every cut into the top bin, exactly as the
    // global max aggregate treated it; nulls bin to 0 and are ignored
    // by min, exactly as the global min did), and both ride the SAME
    // aggregation that counts the bins. Two source scans (quantile
    // rank pass + binning pass) instead of three, no extra state, at
    // any scale.
    val vals = df.select(col(valueCol).cast("double").as("__v"))
    val v = col("__v")
    val eq = exactQuantiles(vals, "__v", qs)
    val bounds = eq
      .agg(array(qs.map(qi =>
        min(when(col("q") === qi, col("value")))): _*).as("__qs"))
    val bin = (0 until nbins - 1)
      .map(i => when(v > col("__qs").getItem(i), 1L).otherwise(0L))
      .reduce(_ + _)
    val edge = (i: Column) => when(i === 0, col("__mn"))
      .otherwise(element_at(col("__qs"), i.cast("int")))
    vals.crossJoin(broadcast(bounds))
      .select(bin.as("bin"), col("__v"), col("__qs"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), first(col("__qs")).as("__qs"),
        min(col("__v")).as("__mn"), max(col("__v")).as("__mx"))
      .select(col("bin"),
        round(edge(col("bin")), 6).as("q_lo"),
        round(when(col("bin") === (nbins - 1), col("__mx"))
          .otherwise(element_at(col("__qs"), (col("bin") + 1).cast("int"))), 6)
          .as("q_hi"),
        col("n"))
  }

  /** Kruskal–Wallis H — the nonparametric [[anovaF]] (rank-based, so
    * outliers and non-normality can't lie), completing the test-family
    * symmetry: Welch↔Mann–Whitney(AUC), ANOVA↔Kruskal–Wallis. Over a
    * value column of ANY cardinality (continuous included — the
    * margin ranks ride globalCumsum), everything derives from
    * (group, value) cells: doubled
    * tie-averaged ranks stay integers, each group's rank-sum is an
    * exact DECIMAL, the per-group S²/n terms are fixed to integers
    * before their (k-bounded) sum, and the tie-correction factor is a
    * ratio of exact integers.
    *
    * @param critical χ²(k−1) at the caller's α (inlined constant)
    * @return one row (n, k, h, significant) — h tie-corrected
    */
  def kruskalWallis(df: DataFrame, groupCol: String, valueCol: String,
                    critical: Double): DataFrame = {
    // r15: the cell table feeds the margin (whose lineage the cumsum
    // checkpoint executes) AND the per-group rank-sum join — persisted
    // once, the source is scanned once instead of three times
    val cells = graft.OpCache.persist(
      df.groupBy(col(groupCol).as("__g"), col(valueCol).as("__v"))
        .agg(count(lit(1)).as("__o")))
    val margin = cells.groupBy(col("__v")).agg(sum(col("__o")).as("__nv"))
    // pooled-margin cumulative counts on the range-partitioned global
    // cumsum (the ks_test shape) — a continuous value column (margin ≈
    // row count) ranks fully parallel, no single-task window. The
    // checkpointed range-partitioned margin comes back too: the tie
    // term scans IT instead of re-running the margin aggregation
    // (bit-identical — same rows, and the integer-decimal sum is
    // order-free)
    val (cum, _, parted) = graft.ops.Ranking
      .globalCumsumN(margin, Seq(col("__v")), Seq("__nv" -> "__cumv"))
    val ranked = cum
      .select(col("__v"),
        (lit(2) * col("__cumv") - col("__nv") + 1).as("__r2"),
        col("__nv"))
    val perG = cells.join(ranked.select(col("__v"), col("__r2")), "__v")
      .groupBy(col("__g"))
      .agg(sum(col("__o")).as("__ng"),
        sum(col("__o").cast(Dec) * col("__r2")).as("__s2"))
    // Σ_g S2_g²/n_g, each term integer-fixed (1e0 units). The fixed
    // term lands DIRECTLY in Decimal(38,0), never in a long: S2 ~
    // n²/k, so S2²/n_g ~ n³/k² crosses 2^63 near n = 10M rows with
    // continuous margins (the r12 scaling fixture hit the CAST_OVERFLOW
    // cliff exactly there). round() of the double is already an exact
    // representable value, so double→decimal is as deterministic as
    // the old double→long — the oracle mirrors with HUGEINT.
    val sums = perG.agg(sum(col("__ng")).as("__n"),
      count(lit(1)).as("__k"),
      sum(round((col("__s2") * col("__s2")).cast("double") / col("__ng"))
        .cast(Dec)).as("__t"))
    val ties = parted.agg(
      sum(col("__nv").cast(Dec) * col("__nv") * col("__nv")
        - col("__nv")).as("__tt"))
    val n = col("__n")
    // doubled ranks: r̄ = r2/2 so 12·Σn r̄² = 3·Σ S2²/n
    val h0 = lit(3.0) * col("__t").cast("double") /
      (n * (n + 1)).cast("double") - lit(3.0) * (n + 1)
    val corr = lit(1.0) - col("__tt").cast("double") /
      (n.cast(Dec) * n * n - n).cast("double")
    sums.crossJoin(broadcast(ties))
      .select(n.as("n"), col("__k").as("k"),
        when(corr === 0.0, lit(null).cast("double"))
          .otherwise(round(h0 / corr, 6)).as("h"),
        when(corr === 0.0, lit(null).cast("boolean"))
          .otherwise(round(h0 / corr - critical, 6) > 0.0)
          .as("significant"))
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) — the two-sample companion of
    * [[kruskalWallis]] (k = 2 specialised to the classic U statistic,
    * effect size and direction): does `valueCol`'s location differ
    * between the two samples? Same any-cardinality doubled-rank cell
    * machinery: ranks derive from the pooled
    * margin cumsum, each sample's rank-sum is an exact DECIMAL, and
    * U = R − n(n+1)/2 stays an exact integer (doubled). The normal
    * approximation carries the exact tie correction; the AUC effect
    * size U/(n_a·n_b) is the probability a random `a` exceeds a
    * random `b` (ties half-counted).
    *
    * @param critical two-sided |z| cutoff (1.96 at α=0.05 — inlined
    *   constant, the chi2Test discipline)
    * @return one row (n_a, n_b, u, auc, z, significant)
    */
  def mannWhitney(a: DataFrame, b: DataFrame, valueCol: String,
                  critical: Double = 1.96): DataFrame = {
    // r15: persisted — the cell table feeds the margin (executed by
    // the cumsum checkpoint) and the rank-sum join; each used to
    // re-run both source scans + the union
    val cells = graft.OpCache.persist(
      a.select(col(valueCol).as("__v"), lit(0).as("__g"))
        .unionByName(b.select(col(valueCol).as("__v"), lit(1).as("__g")))
        .groupBy(col("__g"), col("__v")).agg(count(lit(1)).as("__o")))
    val margin = cells.groupBy(col("__v")).agg(sum(col("__o")).as("__nv"))
    // pooled-margin cumulative counts via globalCumsum (the
    // kruskalWallis shape) — parallel at any value cardinality; the
    // tie term scans the checkpointed range-partitioned margin
    // instead of re-running the margin aggregation
    val (cum, _, parted) = graft.ops.Ranking
      .globalCumsumN(margin, Seq(col("__v")), Seq("__nv" -> "__cumv"))
    val ranked = cum
      .select(col("__v"),
        (lit(2) * col("__cumv") - col("__nv") + 1).as("__r2"))
    val perG = cells.join(ranked, "__v")
      .groupBy(col("__g"))
      .agg(sum(col("__o")).as("__ng"),
        sum(col("__o").cast(Dec) * col("__r2")).as("__s2"))
    val sums = perG.agg(
      max(when(col("__g") === 0, col("__ng"))).as("__na"),
      max(when(col("__g") === 1, col("__ng"))).as("__nb"),
      max(when(col("__g") === 0, col("__s2"))).as("__r2a"))
    val ties = parted.agg(
      sum(col("__nv").cast(Dec) * col("__nv") * col("__nv")
        - col("__nv")).as("__tt"))
    val na = col("__na").cast(Dec)
    val nb = col("__nb").cast(Dec)
    val n = na + nb
    // doubled U: 2U_a = R2_a − 2·n_a(n_a+1)/2 = R2_a − n_a(n_a+1)
    val u2 = col("__r2a") - na * (na + 1)
    // σ²_U = n_a·n_b/12 · [(n+1) − Σ(t³−t)/(n(n−1))] — every operand an
    // exact integer; the one float expression associates identically
    // in the oracle
    val varU = (na * nb).cast("double") / 12.0 *
      ((n + 1).cast("double") -
        col("__tt").cast("double") / (n * (n - 1)).cast("double"))
    val z = (u2 - na * nb).cast("double") / 2.0 / sqrt(varU)
    sums.crossJoin(broadcast(ties))
      .select(col("__na").cast("long").as("n_a"),
        col("__nb").cast("long").as("n_b"),
        round(u2.cast("double") / 2.0, 6).as("u"),
        round(u2.cast("double") / (na * nb).cast("double") / 2.0, 6)
          .as("auc"),
        when(varU <= 0.0, lit(null).cast("double"))
          .otherwise(round(z, 6)).as("z"),
        when(varU <= 0.0, lit(null).cast("boolean"))
          .otherwise(round(abs(z) - critical, 6) > 0.0).as("significant"))
  }

  /** Brown–Forsythe test — the robust Levene: do the GROUPS differ in
    * SPREAD? (the variance-homogeneity assumption check behind
    * [[anovaF]], median-centred so heavy tails can't lie). Per-group
    * medians come from the (group, value) cell cumsums as explicit
    * middle order statistics (no per-group buffer); the absolute
    * deviations are fixed to 1e-6 integers at derivation and the
    * whole one-way F runs on cell-count-weighted exact DECIMAL sums.
    *
    * @param critical F(k−1, n−k) at the caller's α (inlined constant)
    * @return one row (n, k, w, significant)
    */
  def brownForsythe(df: DataFrame, groupCol: String, valueCol: String,
                    critical: Double): DataFrame = {
    // r15 note: persisting this cell table was A/B'd and REVERTED —
    // with a continuous value column the cells are data-sized, and
    // materializing them cost more at sf0.1 (min 2.0 s → 3.6 s over
    // four interleaved pairs) than the repeated pruned parquet scans
    // it saved; the k-bounded-cells stats (kruskal/mannWhitney/
    // spearman) keep their persists, where the same A/B won
    val cells = df.groupBy(col(groupCol).as("__g"),
        col(valueCol).cast("double").as("__v"))
      .agg(count(lit(1)).as("__o"))
    // per-group cumulative counts WITHOUT a per-group window task: a
    // group's value margin is data-sized when values are continuous,
    // so Window.partitionBy(__g) would funnel the largest group
    // through one task — groupedCumsum range-partitions regardless of
    // group skew (group COUNT stays k-bounded, the test contract)
    val withCum = graft.ops.Ranking
      .groupedCumsum(cells, "__g", Seq(col("__v")), "__o", "__cum")
    val totals = cells.groupBy(col("__g")).agg(sum(col("__o")).as("__ngt"))
    // explicit middle order statistics: ranks ⌊(n+1)/2⌋ and ⌈(n+1)/2⌉
    val meds = withCum.join(broadcast(totals), "__g")
      .groupBy(col("__g"))
      .agg(
        min(when(col("__cum") >= floor((col("__ngt") + 1) / 2), col("__v")))
          .as("__mlo"),
        min(when(col("__cum") >= ceil((col("__ngt") + 1) / 2)
          .cast("long"), col("__v"))).as("__mhi"))
      .select(col("__g"),
        round((col("__mlo") + col("__mhi")) / 2.0, 9).as("__med"))
    // |x − med| fixed to 1e-6 integers; from here the one-way F runs
    // on exact integer sums (the anovaF arithmetic, cell-weighted)
    val zc = cells.join(broadcast(meds), "__g")
      .select(col("__g"), col("__o"),
        round(abs(col("__v") - col("__med")) * 1e6).cast("long").as("__z6"))
    val means = zc.groupBy(col("__g"))
      .agg(sum(col("__o")).as("__ng"),
        sum(col("__o").cast(Dec) * col("__z6")).as("__sg"))
      .select(col("__g"), col("__ng"),
        round(col("__sg").cast("double") / col("__ng") / 1e6, 9).as("__mg"))
    val grand = zc
      .agg(sum(col("__o")).as("__n"),
        sum(col("__o").cast(Dec) * col("__z6")).as("__s"))
      .select(col("__n"),
        round(col("__s").cast("double") / col("__n") / 1e6, 9).as("__mu"))
    val dev = col("__z6").cast("double") / 1e6 - col("__mg")
    val ssw = zc.join(broadcast(means), "__g")
      .select((col("__o").cast(Dec) *
        round(dev * dev * 1e6).cast("long").cast(Dec)).as("__w6"))
      .agg(sum(col("__w6")).as("__ssw6"))
    val bdev = col("__mg") - col("__mu")
    val ssb = means.crossJoin(broadcast(grand))
      .select(round(col("__ng") * bdev * bdev * 1e6).cast(Dec).as("__b6"))
      .agg(sum(col("__b6")).as("__ssb6"), count(lit(1)).as("__k"))
    // the shared 1e-6 fixing scale cancels inside the ratio
    val w = (col("__ssb6").cast("double") / (col("__k") - 1)) /
      (col("__ssw6").cast("double") / (col("__n") - col("__k")))
    grand.crossJoin(broadcast(ssw)).crossJoin(broadcast(ssb))
      .select(col("__n").as("n"), col("__k").as("k"),
        round(w, 6).as("w"),
        (round(w - critical, 6) > 0.0).as("significant"))
  }

  /** Mood's median test — the coarsest k-sample location screen: does
    * each group straddle the GRAND median the way chance predicts?
    * (more robust than either F when tails are wild, at the price of
    * power). The grand median is the explicit middle order statistic
    * of the pooled value margin; the 2×k contingency of
    * above-vs-not-above then rides the [[chi2Test]] machinery.
    *
    * @param critical χ²(k−1) at the caller's α (inlined constant)
    * @return one row (n, dof, chi2, significant) plus grand_median
    */
  def moodMedian(df: DataFrame, groupCol: String, valueCol: String,
                 critical: Double): DataFrame = {
    val margin = df.select(col(valueCol).cast("double").as("__v"))
      .groupBy(col("__v")).agg(count(lit(1)).as("__nv"))
    // pooled-margin cumulative counts via globalCumsum (the
    // kruskalWallis shape) — parallel at any value cardinality. The
    // grand total comes from the cumsum machinery's exact
    // per-partition sums (r15) instead of re-running the margin
    // aggregation — one fewer full pass over the source
    val (cum, totals, _) = graft.ops.Ranking
      .globalCumsumN(margin, Seq(col("__v")), Seq("__nv" -> "__cum"))
    val tot = totals.select(col("__nv_total").as("__nt"))
    val med = cum.crossJoin(broadcast(tot))
      .agg(
        min(when(col("__cum") >= floor((col("__nt") + 1) / 2), col("__v")))
          .as("__mlo"),
        min(when(col("__cum") >= ceil((col("__nt") + 1) / 2)
          .cast("long"), col("__v"))).as("__mhi"))
      .select(round((col("__mlo") + col("__mhi")) / 2.0, 9).as("__med"))
    val tagged = df.crossJoin(broadcast(med))
      .select(col(groupCol),
        (col(valueCol).cast("double") > col("__med")).as("__above"),
        col("__med"))
    chi2Test(tagged, groupCol, "__above", critical)
      .crossJoin(broadcast(med.select(col("__med").as("grand_median"))))
  }

  /** McNemar's test for paired binary outcomes — "did the flag flip
    * between conditions more one way than the other" (before/after a
    * pipeline change on the same units, two filters on the same
    * documents). Only the discordant cells matter:
    * χ² = (b − c)²/(b + c) with the continuity correction off (the
    * large-sample regime this engine lives in). One cell aggregation,
    * all integers until the final ratio.
    *
    * @param critical χ²(1) at the caller's α (3.841 at 0.05)
    * @return one row (n, b, c, chi2, significant)
    */
  def mcnemar(df: DataFrame, colA: Column, colB: Column,
              critical: Double = 3.841): DataFrame = {
    val a = colA.cast("boolean")
    val b = colB.cast("boolean")
    val cells = df.agg(count(lit(1)).as("n"),
      sum(when(a && !b, 1L).otherwise(0L)).as("b"),
      sum(when(!a && b, 1L).otherwise(0L)).as("c"))
    val chi2 = ((col("b") - col("c")) * (col("b") - col("c")))
      .cast("double") / (col("b") + col("c"))
    cells.select(col("n"), col("b"), col("c"),
      when(col("b") + col("c") === 0, lit(null).cast("double"))
        .otherwise(round(chi2, 6)).as("chi2"),
      when(col("b") + col("c") === 0, lit(null).cast("boolean"))
        .otherwise(round(chi2 - critical, 6) > 0.0).as("significant"))
  }

  /** Cohen's kappa — chance-corrected agreement between two
    * categorical labellings of the same rows (two classifiers, a
    * heuristic vs a model, annotator pairs):
    * κ = (p_o − p_e)/(1 − p_e) with p_o the observed agreement and
    * p_e the marginal-product expectation. Cells and margins are exact
    * integers (the chi2Test shape); p_o and p_e are ratios of exact
    * DECIMAL products, so κ is one deterministic float expression.
    *
    * @return one row (n, po, pe, kappa)
    */
  def cohensKappa(df: DataFrame, colA: String, colB: String): DataFrame = {
    val cells = df.groupBy(col(colA).cast("string").as("__a"),
        col(colB).cast("string").as("__b"))
      .agg(count(lit(1)).as("__o"))
    val agree = cells.agg(sum(col("__o")).as("__n"),
      sum(when(col("__a") === col("__b"), col("__o")).otherwise(0L))
        .as("__ag"))
    val ra = cells.groupBy(col("__a").as("__v")).agg(sum(col("__o")).as("__ra"))
    val cb = cells.groupBy(col("__b").as("__v")).agg(sum(col("__o")).as("__cb"))
    // Σ_v rowTot_v · colTot_v as an exact DECIMAL (values absent from
    // one margin contribute 0 — inner join)
    val pe0 = ra.join(cb, "__v")
      .agg(coalesce(sum(col("__ra").cast(Dec) * col("__cb")),
        lit(0L).cast(Dec)).as("__pe0"))
    val po = col("__ag").cast("double") / col("__n")
    val pe = col("__pe0").cast("double") /
      (col("__n").cast(Dec) * col("__n")).cast("double")
    agree.crossJoin(broadcast(pe0))
      .select(col("__n").as("n"), round(po, 6).as("po"),
        round(pe, 6).as("pe"),
        when(pe === 1.0, lit(null).cast("double"))
          .otherwise(round((po - pe) / (lit(1.0) - pe), 6)).as("kappa"))
  }

  /** Per-group trimmed mean: drop values outside the [lo, hi] exact
    * quantiles, then average the survivors on exact integer cents.
    * Two passes (the exact-percentile pass buffers per group — at
    * 100 TB swap for `approx_percentile`, the profileApprox envelope
    * discipline); the trim bounds broadcast back.
    *
    * @return (groupCol, q_lo, q_hi, n_kept, trimmed_mean)
    */
  def trimmedMean(df: DataFrame, groupCol: String, valueCol: String,
                  lo: Double = 0.1, hi: Double = 0.9): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"bad trim bounds [$lo, $hi]")
    val bounds = df.groupBy(col(groupCol))
      .agg(expr(s"percentile(CAST($valueCol AS DOUBLE), $lo)").as("q_lo"),
        expr(s"percentile(CAST($valueCol AS DOUBLE), $hi)").as("q_hi"))
    df.join(broadcast(bounds), groupCol)
      .filter(col(valueCol) >= col("q_lo") && col(valueCol) <= col("q_hi"))
      .groupBy(col(groupCol), round(col("q_lo"), 6).as("q_lo"),
        round(col("q_hi"), 6).as("q_hi"))
      .agg(count(lit(1)).as("n_kept"),
        round(sum(round(col(valueCol) * 100).cast("long")
            .cast(Dec)).cast("double") / count(lit(1)) / 100.0, 6)
          .as("trimmed_mean"))
  }
}
