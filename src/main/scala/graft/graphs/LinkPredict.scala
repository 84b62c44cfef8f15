package graft.graphs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link prediction over an undirected candidate-pair list (the same
  * near-dup graphs [[Triangles]] counts on) — "which non-adjacent doc
  * pairs LOOK like they should be duplicates": a pair sharing many
  * neighbours in the near-dup graph is a likely missed edge (banding
  * false negative), so these scores are the audit surface for LSH
  * recall. Three classic neighborhood scores per candidate pair:
  * common-neighbour count, neighbour-set Jaccard, and Adamic–Adar
  * (Σ_z 1/ln deg z — rare shared neighbours weigh more).
  *
  * Scale shape: the wedge self-join keys on the shared neighbour z
  * (never all pairs — candidate volume is Σ_z deg(z)², the standard
  * friend-of-friend bound, and a near-dup graph's degrees are banding-
  * bounded); degrees join back on node keys. Everything shuffles on
  * graph keys and scales out.
  *
  * Determinism: counts and degrees are integers; each Adamic–Adar term
  * is fixed to 1e-9 integers before its sum (deg ≥ 2 for any shared
  * neighbour, so ln ≥ ln 2 and the term is bounded); Jaccard divides
  * exact integers. The gate's layout-proof discipline.
  */
object LinkPredict {

  /** Scores for every non-adjacent pair with ≥ 1 common neighbour.
    *
    * @param pairs undirected edge list (id_a, id_b); duplicates and
    *   self-loops tolerated
    * @return (id_a, id_b, common_neighbors, jaccard, adamic_adar),
    *   id_a < id_b
    */
  def scores(pairs: DataFrame): DataFrame = {
    // persisted (releasable, OpCache — r15): adj feeds the degree
    // table and BOTH wedge-join sides — unpersisted, each of the
    // three consumers re-ran canon's whole pipeline (the banded pair
    // generator) twice over (once per union branch)
    val canon = graft.OpCache.persist(pairs
      .select(least(col("id_a"), col("id_b")).as("a"),
        greatest(col("id_a"), col("id_b")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct())
    val adj = canon.select(col("a").as("x"), col("b").as("z"))
      .union(canon.select(col("b").as("x"), col("a").as("z")))
    val deg = adj.groupBy(col("x").as("id")).agg(count(lit(1)).as("deg"))
    val wedges = adj.as("e1")
      .join(adj.as("e2"),
        col("e1.z") === col("e2.z") && col("e1.x") < col("e2.x"))
      .select(col("e1.x").as("a"), col("e2.x").as("b"), col("e1.z").as("z"))
    wedges
      .join(deg.select(col("id").as("z"), col("deg").as("__dz")), "z")
      .groupBy("a", "b")
      .agg(count(lit(1)).as("common_neighbors"),
        sum(round(lit(1e9) / log(col("__dz").cast("double")))
          .cast("long")).as("__aa9"))
      // anti-join the existing edges: only MISSING links are predicted
      .join(canon.withColumn("__e", lit(1)), Seq("a", "b"), "left")
      .filter(col("__e").isNull)
      .join(deg.select(col("id").as("a"), col("deg").as("__da")), "a")
      .join(deg.select(col("id").as("b"), col("deg").as("__db")), "b")
      .select(col("a").as("id_a"), col("b").as("id_b"),
        col("common_neighbors"),
        round(col("common_neighbors") /
          (col("__da") + col("__db") - col("common_neighbors")), 6)
          .as("jaccard"),
        round(col("__aa9") / 1e9, 6).as("adamic_adar"))
  }
}
