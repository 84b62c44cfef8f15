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

  /** Per-group distinctive vocabulary — the "fightin' words"
    * log-odds-with-Dirichlet-prior statistic (Monroe et al. 2008),
    * the standard answer to "which tokens characterise each source /
    * language / time slice" in corpus audits:
    *
    *   δ_gw = ln( (y_gw + α) / (n_g + αV − y_gw − α) )
    *        − ln( (y_w' + α) / (n' + αV − y_w' − α) )
    *   z_gw = δ_gw / √(1/(y_gw + α) + 1/(y_w' + α))
    *
    * with y' / n' the counts in the REST of the corpus.
    *
    * Scale shape: ONE (group, token) count aggregate (map-side
    * combinable) feeding both the per-token corpus totals (token-keyed
    * re-agg) and the per-group totals (group-keyed, tiny, broadcast);
    * the z-score is then a pure projection and the per-group top-k a
    * window bounded by k. Nothing corpus-sized is broadcast.
    *
    * Determinism: counts are exact longs; δ and the variance are
    * rounded 1e-9 before the ratio so the ranking key is
    * engine-stable, ties break on token.
    *
    * @return (group, tok, n BIGINT, zscore, rank INT) — top `k`
    *   tokens per group by z
    */
  def distinctiveTerms(docs: DataFrame, groupCol: String, k: Int = 10,
                       alpha: Double = 0.5,
                       textCol: String = "text"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(alpha > 0.0, s"alpha must be positive, got $alpha")
    val toks = docs.select(col(groupCol).as("group"),
      explode(split(TextOps.normalize(col(textCol)), " ")).as("tok"))
    val gw = toks.groupBy("group", "tok").agg(count(lit(1)).as("n"))
    val w = gw.groupBy("tok").agg(sum("n").as("n_w"))
    val g = gw.groupBy("group").agg(sum("n").as("n_g"))
    val tot = gw.agg(sum("n").as("n_tot"),
      countDistinct("tok").cast("double").as("v"))
    val av = col("v") * alpha
    val yRest = col("n_w") - col("n")
    val nRest = col("n_tot") - col("n_g")
    val delta = round(
      log((col("n") + alpha) / (col("n_g") + av - col("n") - alpha))
        - log((yRest + alpha) / (nRest + av - yRest - alpha)), 9)
    val variance = round(lit(1.0) / (col("n") + alpha)
      + lit(1.0) / (yRest + alpha), 9)
    val scored = gw.join(w, "tok")
      .join(broadcast(g), "group")
      .crossJoin(broadcast(tot))
      .select(col("group"), col("tok"), col("n"),
        round(delta / sqrt(variance), 9).as("z"))
    scored.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("group")
          .orderBy(col("z").desc, col("tok"))).cast("int"))
      .filter(col("rank") <= k)
      .select(col("group"), col("tok"), col("n"),
        round(col("z"), 6).as("zscore"), col("rank"))
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
