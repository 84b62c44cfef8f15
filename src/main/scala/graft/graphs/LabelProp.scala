package graft.graphs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous label propagation over an undirected candidate-pair
  * list — community detection one level finer than connected
  * components: where [[graft.dedup.Dedup.connectedComponents]] fuses
  * everything reachable, LPA splits a weakly-bridged blob into its
  * dense cores (the near-dup "template families" inside one giant
  * component). Deterministic variant: every node starts labelled with
  * its own id; each round a node adopts the most frequent label among
  * its neighbours, ties broken by the SMALLEST label; all nodes update
  * simultaneously (synchronous), so the result after a fixed number of
  * rounds is engine-independent — which is what lets one unrolled
  * DuckDB oracle pin it, the PageRank discipline.
  *
  * Per round: ONE edge-keyed join of the current labels with the
  * persisted symmetric edge list, one (node, label) count aggregation,
  * and a per-node argmax window (bounded by that node's distinct
  * neighbour labels). O(E) shuffled per round, `localCheckpoint`
  * keeping the iterated plan flat.
  */
object LabelProp {

  def labelPropagation(pairs: DataFrame, iters: Int,
                       srcCol: String = "id_a",
                       dstCol: String = "id_b"): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val sym = graft.OpCache.persist(
      Edges.symmetrize(pairs, srcCol, dstCol))
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
    (1 to iters).foreach { _ =>
      labels = sym
        .join(labels, col("dst") === col("id"))
        .groupBy(col("src"), col("label"))
        .agg(count(lit(1)).as("__n"))
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("src"))
            .orderBy(col("__n").desc, col("label"))))
        .filter(col("__rn") === 1)
        .select(col("src").as("id"), col("label"))
        .localCheckpoint()
    }
    labels
  }
}
