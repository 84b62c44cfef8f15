package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained corpus-quality classification — the fastText/CCNet-style
  * "linear classifier over token features" filter that large-scale
  * pretraining pipelines put between raw crawl and the kept corpus,
  * here as a multinomial Naive Bayes trained AND applied in one Spark
  * plan (no driver-side model state).
  *
  * Train: per-token positive/negative counts with Laplace smoothing →
  * per-token log-odds. Score: each document sums the log-odds of its
  * tokens plus the class prior; `pred = score > 0`.
  *
  * Scale shape (the bm25 discipline, `text/Index.scala`):
  *  - the (doc, token) explode is scan-side;
  *  - token counts are a map-side-combinable hash aggregate keyed by
  *    token (vocabulary-sized, not corpus-sized);
  *  - corpus totals are ONE 1-row aggregate broadcast back;
  *  - scoring joins tokens to the vocabulary-keyed log-odds table —
  *    a shuffle on token, never a corpus broadcast.
  *
  * Determinism (cross-engine + cross-partitioning): each token's
  * log-odds is fixed to 1e-6 units as a BIGINT ("micro log-odds")
  * BEFORE the per-document sum, so the score is a sum of integers —
  * order-independent exactly, and immune to the last-ULP differences
  * of ln() between engines (a 1-ulp ln flip moves the micro rounding
  * only when the true value sits within ~1e-15 of a .5e-6 boundary).
  * The double division back to a score happens once, on the exact
  * integer sum, identically on both engines.
  */
object Classifier {

  /** Per-token micro log-odds table: (tok, lo_micro BIGINT).
    * `pos` must be an already-materialised 0/1 int column on `toks`.
    */
  private def tokenLogOdds(toks: DataFrame): DataFrame = {
    val counts = toks.groupBy("tok").agg(
      sum(col("pos")).cast("double").as("cp"),
      sum(lit(1) - col("pos")).cast("double").as("cn"))
    val tot = counts.agg(
      sum("cp").as("tp"), sum("cn").as("tn"),
      count(lit(1)).cast("double").as("v"))
    counts.crossJoin(broadcast(tot)).select(
      col("tok"),
      round((log((col("cp") + 1.0) / (col("tp") + col("v")))
        - log((col("cn") + 1.0) / (col("tn") + col("v")))) * 1e6, 0)
        .cast("long").as("lo_micro"))
  }

  /** Train on `labelCol` (boolean) over `textCol`, score every
    * document. Output: (doc_id, nb_score DOUBLE, nb_pred INT).
    */
  def nbScore(docs: DataFrame, labelCol: Column,
              textCol: String = "text"): DataFrame = {
    val toks = docs.select(col("doc_id"),
      labelCol.cast("int").as("pos"),
      explode(split(TextOps.normalize(col(textCol)), " ")).as("tok"))
    val lo = tokenLogOdds(toks)
    // class prior from document counts, micro-fixed like the tokens
    val prior = docs.agg(
      round(log((sum(labelCol.cast("int")).cast("double") + 1.0) /
        (sum(lit(1) - labelCol.cast("int")).cast("double") + 1.0)) * 1e6, 0)
        .cast("long").as("prior_micro"))
    val scores = toks.join(lo, "tok")
      .groupBy("doc_id").agg(sum("lo_micro").as("s_micro"))
    scores.crossJoin(broadcast(prior)).select(
      col("doc_id"),
      round((col("s_micro") + col("prior_micro")).cast("double") / 1e6, 6)
        .as("nb_score"),
      ((col("s_micro") + col("prior_micro")) > 0L).cast("int").as("nb_pred"))
  }
}
