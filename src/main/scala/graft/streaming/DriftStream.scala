package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming PSI drift monitoring — the incremental twin of
  * [[graft.sampling.Sampling.psi]], which like CUSUM is inherently a
  * monitoring use case: watch a numeric feature's distribution as
  * batches arrive and compare it against REFERENCE bins fitted on a
  * training window.
  *
  * Split exactly as [[CusumStream]]: `fitBaseline` computes the
  * reference bin table ONCE (edges from the reference min/max, 1e-9
  * rounded; per-bin reference counts); `scoreAgainst` assigns bins
  * scan-side (stateless — runs under `readStream` unchanged), counts
  * per bin (a streaming-safe grouped aggregation), and derives the
  * smoothed shares + PSI terms. The `psi_total` roll-up is a 10-row
  * window — compute it per micro-batch via `foreachBatch` on a
  * stream; in batch mode the result equals `Sampling.psi` row for row,
  * which is what lets one DuckDB oracle pin both.
  */
object DriftStream {

  /** Reference bin table: (bin, n_ref, __mn, __w) — `bins` rows, the
    * broadcastable static side of the stream-static join.
    */
  def fitBaseline(ref: DataFrame, valueCol: String,
                  bins: Int = 10): DataFrame = {
    require(bins > 1, s"need bins > 1, got $bins")
    val spark = ref.sparkSession
    val v = col(valueCol).cast("double")
    val r = ref.select(v.as("v")).filter(!isnan(col("v")) && col("v").isNotNull)
    val stats = r.agg(round(min(col("v")), 9).as("__mn"),
      round((max(col("v")) - min(col("v"))) / bins, 9).as("__w"))
    val counts = r.crossJoin(broadcast(stats))
      .select(binOf(col("v"), bins).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n_ref"))
    spark.range(bins).select(col("id").cast("int").as("bin"))
      .join(counts, Seq("bin"), "left")
      .na.fill(0L, Seq("n_ref"))
      .crossJoin(broadcast(stats))
  }

  /** The shared bin assignment (requires __mn / __w in scope). */
  private def binOf(v: org.apache.spark.sql.Column, bins: Int) =
    least(greatest(
      when(col("__w") === 0.0, lit(0))
        .otherwise(floor((v - col("__mn")) / col("__w")).cast("int")),
      lit(0)), lit(bins - 1))

  /** Score a current frame (batch) or stream micro-batch against the
    * fitted baseline. Output matches `Sampling.psi`:
    * (bin, n_ref, n_cur, share_ref, share_cur, psi_term, psi_total).
    */
  def scoreAgainst(cur: DataFrame, baseline: DataFrame, valueCol: String,
                   bins: Int = 10, alpha: Double = 0.5): DataFrame = {
    require(alpha > 0.0, s"alpha must be positive, got $alpha")
    val v = col(valueCol).cast("double")
    val stats = baseline.select("__mn", "__w").distinct()
    val curCounts = cur
      .select(v.as("v")).filter(!isnan(col("v")) && col("v").isNotNull)
      .crossJoin(broadcast(stats))
      .select(binOf(col("v"), bins).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n_cur"))
    val joined = baseline.select("bin", "n_ref")
      .join(curCounts, Seq("bin"), "left")
      .na.fill(0L, Seq("n_cur"))
    val totals = joined.agg(sum(col("n_ref")).as("__tr"),
      sum(col("n_cur")).as("__tc"))
    val p = (col("n_ref") + alpha) / (col("__tr") + bins * alpha)
    val q = (col("n_cur") + alpha) / (col("__tc") + bins * alpha)
    joined.crossJoin(broadcast(totals))
      .withColumn("psi_term", round((q - p) * log(q / p), 9))
      .withColumn("psi_total",
        round(sum(col("psi_term")).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(graft.plans.PlanLint.kBoundedKey(col("bin")))), 6))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        round(p, 6).as("share_ref"), round(q, 6).as("share_cur"),
        round(col("psi_term"), 6).as("psi_term"), col("psi_total"))
  }
}
