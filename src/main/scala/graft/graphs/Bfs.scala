package graft.graphs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-hop BFS over an undirected pair list — "how far is every
  * node from a seed set": contamination blast radius from known-bad
  * documents through the near-dup graph, influence neighbourhoods, or
  * any reachability audit where only the first few hops matter.
  *
  * Iterative frontier relaxation as DataFrame joins, the PageRank /
  * connected-components discipline: per hop ONE edge-keyed join of the
  * current distance table with the (persisted) symmetrized edges and a
  * node-keyed min aggregate — O(E) shuffled per hop, `localCheckpoint`
  * keeping the iterated plan flat. `maxHops` bounds the loop (the
  * caller's radius of interest), so the driver never runs an
  * unbounded convergence loop; nodes outside the radius report null.
  *
  * Determinism: pure integer arithmetic — hop counts are exact
  * whatever the partitioning, and the oracle unrolls the same
  * relaxation as chained CTEs.
  */
object Bfs {

  /** @param seedPred predicate over the node-id column marking the
    *                  hop-0 seed set (evaluated on every node id that
    *                  appears in the pair list)
    * @return (id, hops) — hops null when unreachable within maxHops
    */
  def hopDistance(pairs: DataFrame, seedPred: Column => Column,
                  maxHops: Int, srcCol: String = "id_a",
                  dstCol: String = "id_b"): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val sym = graft.OpCache.persist(
      Edges.symmetrize(pairs, srcCol, dstCol))
    var dist = sym.select(col("src").as("id")).distinct()
      .select(col("id"),
        when(seedPred(col("id")), 0L).cast("long").as("hops"))
      .localCheckpoint()
    (1 to maxHops).foreach { _ =>
      val relaxed = sym
        .join(dist.select(col("id").as("dst"), col("hops").as("__dh")), "dst")
        .filter(col("__dh").isNotNull)
        .groupBy(col("src"))
        .agg((min(col("__dh")) + 1L).as("__nh"))
      dist = dist
        .join(relaxed, dist("id") === relaxed("src"), "left")
        // Spark's least skips nulls, so this is min-of-defined
        .select(col("id"), least(col("hops"), col("__nh")).as("hops"))
        .localCheckpoint()
    }
    dist
  }
}
