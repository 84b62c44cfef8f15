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
