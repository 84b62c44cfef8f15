package graft.graphs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting over an undirected candidate-pair list (the same
  * near-dup graphs [[PageRank]] ranks) — the local clustering signal:
  * a document whose neighbours are also mutual near-dups sits inside a
  * dense template cluster (boilerplate family), while a high-degree
  * node with zero triangles is a hub stitching unrelated docs.
  *
  * Algorithm: the classic degree-ordered orientation. Edges are
  * canonicalized and deduplicated, each node gets its degree, and
  * every edge is oriented from the LOWER (degree, id) endpoint to the
  * higher. Each triangle {a,b,c} then materializes exactly once as the
  * wedge (u→v, u→w) at its lowest-ranked corner closed by the oriented
  * edge v→w. The orientation bounds every node's out-degree by
  * O(√E), so the wedge join — the only super-linear step — generates
  * O(E^1.5) rows worst-case instead of Σdeg² (which a star node makes
  * quadratic). Three equi-joins + one explode + one count aggregate,
  * all on key-partitioned shuffles: the 100 TB shape.
  *
  * Determinism: pure integer arithmetic — counts are exact whatever
  * the partitioning.
  */
object Triangles {

  /** Per-node triangle counts (nodes in no triangle report 0).
    *
    * @param pairs undirected edge list; self-loops and duplicate /
    *              reversed listings are collapsed
    * @return (id, triangles)
    */
  def triangleCounts(pairs: DataFrame, srcCol: String = "id_a",
                     dstCol: String = "id_b"): DataFrame = {
    val canon = graft.OpCache.persist(
      pairs.select(least(col(srcCol), col(dstCol)).cast("long").as("a"),
          greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
        .filter(col("a") < col("b"))
        .distinct())
    val deg = canon.select(col("a").as("id"))
      .unionByName(canon.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    // orient low (deg, id) → high; carry the dst's rank pair so wedge
    // legs can be ordered by the SAME total order
    val oriented = graft.OpCache.persist(
      canon
        .join(deg.select(col("id").as("a"), col("deg").as("__da")), "a")
        .join(deg.select(col("id").as("b"), col("deg").as("__db")), "b")
        .select(
          when(struct(col("__da"), col("a")) < struct(col("__db"), col("b")),
            struct(col("a").as("src"), col("b").as("dst"),
              col("__db").as("ddeg")))
            .otherwise(struct(col("b").as("src"), col("a").as("dst"),
              col("__da").as("ddeg"))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"),
          col("e.ddeg").as("ddeg")))
    val e1 = oriented.select(col("src").as("u"), col("dst").as("v"),
      col("ddeg").as("dv"))
    val e2 = oriented.select(col("src").as("u"), col("dst").as("w"),
      col("ddeg").as("dw"))
    val wedges = e1.join(e2, Seq("u"))
      .filter(struct(col("dv"), col("v")) < struct(col("dw"), col("w")))
    val tris = wedges.join(
      oriented.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"))
    val perNode = tris
      .select(explode(array(col("u"), col("v"), col("w"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("triangles"))
    deg.select(col("id"))
      .join(perNode, Seq("id"), "left")
      .select(col("id"), coalesce(col("triangles"), lit(0L)).as("triangles"))
  }
}
