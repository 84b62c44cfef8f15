package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-evaluation statistics for classifier outputs at corpus scale —
  * the companion of [[graft.text.Classifier]]: once a quality/language
  * filter scores 100 TB of documents, the question "how well does the
  * score separate the classes" is itself a big-data aggregation.
  *
  * Exact ROC AUC via the Mann–Whitney U statistic with average-rank
  * tie handling:
  *   AUC = (Σ_pos avgrank − n⁺(n⁺+1)/2) / (n⁺·n⁻)
  * computed entirely from grouped score counts — one aggregation to
  * (score, n⁺, n) cells (bounded by distinct scores, which 1e-9
  * rounding caps), one range-partitioned exact cumulative sum over
  * them ([[graft.ops.Ranking.globalCumsum]] — no single-task window),
  * and one 1-row reduce. All arithmetic rides exact longs doubled to
  * keep half-ranks integral; the only float op is the final division.
  */
object Eval {

  private val Dec = "decimal(38,0)"

  /** Reliability curve: bucket scores (assumed in [0, 1]) into `bins`
    * equal-width bins and compare mean predicted probability with the
    * observed positive rate per bin — the per-bin view behind ECE.
    * One hash aggregation; the per-bin means divide exact integer
    * sums (scores fixed to 1e-9 at the scan), so every output is
    * engine- and layout-exact.
    *
    * @return (bin, n, mean_pred, frac_pos, gap) per non-empty bin
    */
  def calibration(df: DataFrame, scoreCol: Column, labelCol: Column,
                  bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val cells = df.select(round(scoreCol, 9).as("__s"),
        labelCol.cast("boolean").cast("long").as("__y"))
      .select(least(greatest(floor(col("__s") * bins), lit(0)),
          lit(bins - 1)).cast("int").as("bin"),
        col("__s"), col("__y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("__pos"),
        sum(round(col("__s") * 1e9).cast("long").cast(Dec)).as("__ss9"))
    val meanPred = col("__ss9").cast("double") / col("n") / 1e9
    val fracPos = col("__pos").cast("double") / col("n")
    cells.select(col("bin"), col("n"),
      round(meanPred, 6).as("mean_pred"),
      round(fracPos, 6).as("frac_pos"),
      round(abs(meanPred - fracPos), 6).as("gap"))
  }

  /** One-row calibration summary: the Brier score (mean squared
    * error of the probability forecast) and the expected calibration
    * error (bin-count-weighted |mean_pred − frac_pos| over the same
    * `bins` grid as [[calibration]]). Brier terms and per-bin gaps are
    * fixed to 1e-9 integers before their sums.
    *
    * @return one row (n, brier, ece)
    */
  def calibrationSummary(df: DataFrame, scoreCol: Column, labelCol: Column,
                         bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val rows = df.select(round(scoreCol, 9).as("__s"),
      labelCol.cast("boolean").cast("long").as("__y"))
    val brier = rows
      .select(round((col("__s") - col("__y")) * (col("__s") - col("__y"))
        * 1e9).cast("long").cast(Dec).as("__b9"))
      .agg(count(lit(1)).as("n"), sum(col("__b9")).as("__sb9"))
    val binGap = calibration(df, scoreCol, labelCol, bins)
      .select(col("n").as("__nb"),
        round(abs(col("mean_pred") - col("frac_pos")) * 1e9).cast("long")
          .as("__g9"))
      .agg(sum(col("__nb").cast(Dec) * col("__g9")).as("__sg9"))
    brier.crossJoin(broadcast(binGap))
      .select(col("n"),
        round(col("__sb9").cast("double") / col("n") / 1e9, 6).as("brier"),
        round(col("__sg9").cast("double") / col("n") / 1e9, 6).as("ece"))
  }

  /** Weight-of-evidence encoding + information value — the classic
    * credit-scoring feature screen: per category,
    * WOE = ln(pos_share / neg_share) (Laplace-smoothed so empty cells
    * stay finite), and IV = Σ (pos_share − neg_share)·WOE summarises
    * the feature's separating power (rule of thumb: < 0.02 useless,
    * > 0.3 strong). One (category, label) cell aggregation; shares are
    * ratios of exact integers, WOE rounds to 1e-6 per category, IV
    * terms fix to 1e-9 integers before the (category-bounded) sum.
    *
    * @return one row per category (featureCol, n, n_pos, woe, iv_term)
    */
  def weightOfEvidence(df: DataFrame, featureCol: String, labelCol: Column,
                       alpha: Double = 0.5): DataFrame = {
    require(alpha > 0.0, s"alpha must be positive, got $alpha")
    val cells = df.select(col(featureCol).as("__f"),
        labelCol.cast("boolean").cast("long").as("__y"))
      .groupBy(col("__f"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("n_pos"))
    val tot = cells.agg(sum(col("n")).as("__n"), sum(col("n_pos")).as("__p"),
      count(lit(1)).as("__k"))
    val posShare = (col("n_pos") + alpha) /
      (col("__p") + col("__k") * alpha)
    val negShare = (col("n") - col("n_pos") + alpha) /
      (col("__n") - col("__p") + col("__k") * alpha)
    val woe = log(posShare / negShare)
    cells.crossJoin(broadcast(tot))
      .select(col("__f").as(featureCol), col("n"), col("n_pos"),
        round(woe, 6).as("woe"),
        round((posShare - negShare) * woe, 6).as("iv_term"))
  }

  /** Decile lift chart: exact global score buckets (range-partitioned
    * ntile — no single-task window) with per-bucket capture and
    * cumulative lift over the top-scored population. Bucket 1 is the
    * HIGHEST scores (the "contact first" decile).
    *
    * @return (bucket, n, n_pos, capture, cum_capture, lift) per bucket
    */
  def liftChart(df: DataFrame, scoreCol: Column, labelCol: Column,
                buckets: Int = 10): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val rows = df.select(round(scoreCol, 9).as("__s"),
      labelCol.cast("boolean").cast("long").as("__y"))
    val binned = graft.ops.Ranking.globalNtile(rows,
      Seq(col("__s").desc, col("__y").desc), buckets, binCol = "bucket")
    val per = binned.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("n_pos"))
    val tot = per.agg(sum(col("n")).as("__n"), sum(col("n_pos")).as("__p"))
    val wcum = org.apache.spark.sql.expressions.Window
      .partitionBy(graft.plans.PlanLint.kBoundedKey(col("bucket")))
      .orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    per.crossJoin(broadcast(tot))
      .withColumn("__cp", sum(col("n_pos")).over(wcum))
      .withColumn("__cn", sum(col("n")).over(wcum))
      .select(col("bucket"), col("n"), col("n_pos"),
        round(col("n_pos").cast("double") / col("__p"), 6).as("capture"),
        round(col("__cp").cast("double") / col("__p"), 6).as("cum_capture"),
        // lift = cumulative positive rate over the base rate
        round((col("__cp").cast("double") / col("__cn")) /
          (col("__p").cast("double") / col("__n")), 6).as("lift"))
  }

  /** @param labelCol boolean (or 0/1-castable) positive-class flag
    * @return one row (n_pos, n_neg, auc) — auc rounded 1e-6; NULL when
    *         either class is empty
    */
  def aucRoc(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    val cells = df.select(round(scoreCol, 9).as("__s"),
        labelCol.cast("boolean").cast("long").as("__y"))
      .groupBy("__s")
      .agg(sum(col("__y")).as("__pos"), count(lit(1)).as("__n"))
    val cum = graft.ops.Ranking.globalCumsum(cells, Seq(col("__s")), "__n",
        cumCol = "__cum")
      // 2·avgrank of a tied group = 2·(rows before it) + (size+1)
      .withColumn("__r2", lit(2) * (col("__cum") - col("__n"))
        + col("__n") + 1)
    cum.agg(sum(col("__pos")).as("n_pos"),
        sum(col("__n") - col("__pos")).as("n_neg"),
        sum(col("__pos") * col("__r2")).as("__sr2"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") === 0 || col("n_neg") === 0,
          lit(null).cast("double"))
          .otherwise(round(
            (col("__sr2") - col("n_pos") * (col("n_pos") + 1))
              .cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg")), 6)).as("auc"))
  }
}
