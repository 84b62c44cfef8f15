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
