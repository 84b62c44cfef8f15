package graft.graphs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Whole-graph quality statistics over an undirected pair list — the
  * audit companions of the partitioning operators: [[modularity]]
  * scores a community labelling (is the near-dup clustering real
  * structure or noise?), [[assortativity]] measures degree mixing
  * (template hubs attach to other hubs vs to leaves) — together the
  * "should I trust this graph's communities" health check before a
  * keep-best canonicalisation acts on them.
  *
  * Both reduce to exact integer sufficient statistics over the
  * symmetrized edge list (counts, degree sums, degree products) in a
  * constant number of key-partitioned aggregations; floats appear only
  * in the final closed forms — the chi2Test/spearman discipline on
  * graphs.
  */
object GraphStats {

  private val Dec = "decimal(38,0)"

  private def symmetrize(pairs: DataFrame, srcCol: String,
                         dstCol: String): DataFrame =
    Edges.symmetrize(pairs, srcCol, dstCol)

  /** Newman modularity of a labelling:
    *   Q = Σ_c [ e_c/m − (d_c / 2m)² ]
    * with m undirected edges, e_c intra-community edges and d_c the
    * community's degree mass — all exact integers from two edge-keyed
    * aggregations (label join → same-label count; degree → label
    * sum). Each community's term is fixed to 1e-9 integers before the
    * (community-bounded) sum.
    *
    * @param labels (id, label) — e.g. [[LabelProp.labelPropagation]]'s
    *   output; nodes absent from `labels` are dropped with their edges
    * @return one row (m, n_communities, q)
    */
  def modularity(pairs: DataFrame, labels: DataFrame,
                 srcCol: String = "id_a", dstCol: String = "id_b",
                 idCol: String = "id", labelCol: String = "label"): DataFrame = {
    val sym = symmetrize(pairs, srcCol, dstCol)
    val lab = labels.select(col(idCol).cast("long").as("__id"),
      col(labelCol).cast("long").as("__c"))
    val tagged = sym
      .join(lab.select(col("__id").as("src"), col("__c").as("__cs")), "src")
      .join(lab.select(col("__id").as("dst"), col("__c").as("__cd")), "dst")
    // every undirected edge appears twice in sym, so the directed
    // counts ARE the 2m-scaled quantities the formula wants
    val intra = tagged.filter(col("__cs") === col("__cd"))
      .groupBy(col("__cs").as("__c")).agg(count(lit(1)).as("__e2"))
    val degMass = tagged.groupBy(col("__cs").as("__c"))
      .agg(count(lit(1)).as("__d"))
    val m2 = tagged.agg(count(lit(1)).as("__m2"))
    // term_c = e2_c/m2 − (d_c/m2)², each fixed 1e-9 (communities are
    // bounded, but the discipline holds regardless)
    val term = col("__e2").cast("double") / col("__m2") -
      (col("__d").cast("double") / col("__m2")) *
        (col("__d").cast("double") / col("__m2"))
    degMass.join(intra, Seq("__c"), "left").na.fill(0L, Seq("__e2"))
      .crossJoin(broadcast(m2))
      .select(col("__m2"), round(term * 1e9).cast("long").cast(Dec).as("__t9"))
      .groupBy(col("__m2"))
      .agg(count(lit(1)).as("n_communities"), sum(col("__t9")).as("__q9"))
      .select((col("__m2") / 2).cast("long").as("m"), col("n_communities"),
        round(col("__q9").cast("double") / 1e9, 6).as("q"))
  }

  /** Degree assortativity: the Pearson correlation of endpoint degrees
    * over the (directed, symmetrized) edge list — positive when hubs
    * link to hubs. The five sufficient statistics are exact DECIMAL
    * sums of integer degrees; one closed form at the end.
    *
    * @return one row (m, r)
    */
  def assortativity(pairs: DataFrame, srcCol: String = "id_a",
                    dstCol: String = "id_b"): DataFrame = {
    val sym = symmetrize(pairs, srcCol, dstCol)
    val deg = sym.groupBy(col("src").as("__id"))
      .agg(count(lit(1)).as("__deg"))
    val e = sym
      .join(deg.select(col("__id").as("src"), col("__deg").as("__da")), "src")
      .join(deg.select(col("__id").as("dst"), col("__deg").as("__db")), "dst")
    val da = col("__da").cast(Dec)
    val db = col("__db").cast(Dec)
    val s = e.agg(count(lit(1)).as("__m2"),
      sum(da).as("__sx"), sum(db).as("__sy"),
      sum(da * da).as("__sxx"), sum(db * db).as("__syy"),
      sum(da * db).as("__sxy"))
    val n = col("__m2").cast(Dec)
    val num = (n * col("__sxy") - col("__sx") * col("__sy")).cast("double")
    val dx = (n * col("__sxx") - col("__sx") * col("__sx")).cast("double")
    val dy = (n * col("__syy") - col("__sy") * col("__sy")).cast("double")
    s.select((col("__m2") / 2).cast("long").as("m"),
      when(dx <= 0.0 || dy <= 0.0, lit(null).cast("double"))
        .otherwise(round(num / sqrt(dx * dy), 6)).as("r"))
  }
}
