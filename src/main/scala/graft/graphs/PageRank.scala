package graft.graphs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over an undirected candidate-pair list (the output of the
  * dedup family — simhashPairs / minhashLsh / dhashPairs): node
  * centrality inside near-duplicate neighbourhoods, the
  * graph-weighting signal for "keep the canonical, down-weight the
  * satellites" curation policies (and the classic iterative-join
  * workload every relational engine is judged on).
  *
  * Power iteration as DataFrame joins: per pass ONE edge-keyed join of
  * the current ranks with the (persisted) symmetrized edge list and a
  * dst-keyed sum — O(E) shuffled per iteration, `localCheckpoint`
  * keeping the iterated plan flat (the MICE discipline). The
  * symmetrized graph has no dangling nodes (every listed node carries
  * degree ≥ 1), so no dangling-mass term.
  *
  * Determinism: ranks round to 1e-9 after EVERY iteration — per-dst
  * contribution sums are float-order-dependent at the last ULP, and
  * five iterations of drift would otherwise be engine-visible (the
  * cusum lesson); the oracle unrolls the same rounded recurrence as
  * chained CTEs.
  *
  * @return (id, pagerank) — rank rounded 1e-6, summing to ~1
  */
object PageRank {

  def pageRank(pairs: DataFrame, iters: Int, damping: Double = 0.85,
               srcCol: String = "id_a", dstCol: String = "id_b"): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0, 1), got $damping")
    val sym = graft.OpCache.persist(
      Edges.symmetrize(pairs, srcCol, dstCol))
    val deg = graft.OpCache.persist(
      sym.groupBy(col("src")).agg(count(lit(1)).as("deg")))
    val n = deg.count()
    require(n > 0, "pageRank needs a non-empty edge list")
    var ranks = deg.select(col("src").as("id"),
      round(lit(1.0 / n), 9).as("rank"))
    (1 to iters).foreach { _ =>
      // contributions are fixed to exact 1e-15-unit integers BEFORE the
      // per-dst sum: a float sum's accumulation order shifts with
      // partition layout, and 1e-9-rounding an order-dependent double
      // still flips at boundary values (the cusum/outlier lesson) —
      // integer summands make the recurrence layout-proof outright
      val contrib = sym
        .join(deg, "src")
        .join(ranks, col("src") === col("id"))
        .groupBy(col("dst"))
        .agg(sum(round(col("rank") / col("deg") * 1e15).cast("long"))
          .as("__ci"))
      ranks = deg.select(col("src").as("id"))
        .join(contrib, col("id") === col("dst"), "left")
        .select(col("id"),
          round(lit((1.0 - damping) / n) +
            coalesce(col("__ci"), lit(0L)) / 1e15 * damping, 9).as("rank"))
        .localCheckpoint()
    }
    ranks.select(col("id"), round(col("rank"), 6).as("pagerank"))
  }

  /** PERSONALIZED PageRank — the restart mass teleports to a seed set
    * instead of uniformly ("similarity to the seeds through the
    * graph"): the retrieval/expansion score for growing a labelled
    * cluster (contamination sources, a known-bad template family)
    * through near-dup structure. Same integer-fixed, per-iteration
    * 1e-9-rounded recurrence as [[pageRank]]; seeds are the nodes with
    * id < `maxSeedId` (the [[Bfs]] convention, SQL-mirrorable).
    *
    * @return (id, ppr)
    */
  def personalizedPageRank(pairs: DataFrame, iters: Int, maxSeedId: Long,
                           damping: Double = 0.85,
                           srcCol: String = "id_a",
                           dstCol: String = "id_b"): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0, 1), got $damping")
    val sym = graft.OpCache.persist(
      Edges.symmetrize(pairs, srcCol, dstCol))
    val deg = graft.OpCache.persist(
      sym.groupBy(col("src")).agg(count(lit(1)).as("deg")))
    val nSeeds = deg.filter(col("src") < maxSeedId).count()
    require(nSeeds > 0, s"no seed nodes below $maxSeedId in the graph")
    val seedMass = (id: org.apache.spark.sql.Column) =>
      when(id < maxSeedId, lit(1.0 / nSeeds)).otherwise(lit(0.0))
    var ranks = deg.select(col("src").as("id"),
      round(seedMass(col("src")), 9).as("rank"))
    (1 to iters).foreach { _ =>
      val contrib = sym
        .join(deg, "src")
        .join(ranks, col("src") === col("id"))
        .groupBy(col("dst"))
        .agg(sum(round(col("rank") / col("deg") * 1e15).cast("long"))
          .as("__ci"))
      ranks = deg.select(col("src").as("id"))
        .join(contrib, col("id") === col("dst"), "left")
        .select(col("id"),
          round(seedMass(col("id")) * (1.0 - damping) +
            coalesce(col("__ci"), lit(0L)) / 1e15 * damping, 9).as("rank"))
        .localCheckpoint()
    }
    ranks.select(col("id"), round(col("rank"), 6).as("ppr"))
  }
}
