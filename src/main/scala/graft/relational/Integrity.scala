package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-integrity audit for a star schema: foreign-key
  * orphan counts (child rows whose key matches no parent — a NULL
  * child key never matches and therefore counts as a violation) and
  * primary-key uniqueness, one verdict row per check.
  *
  * Scale shape: each FK check is ONE shuffled left-anti join on the
  * key followed by a count — the exact plan AQE turns into a
  * broadcast anti join when the parent is dim-sized, and a shuffled
  * one when both sides are facts; each PK check is one key-keyed
  * count-distinct-style aggregation. Verdict rows are unioned 1-row
  * aggregates, so the audit of any number of checks stays a bounded
  * result however large the tables.
  */
object Integrity {

  /** One foreign-key orphan check. @return 1 row (check, n_rows, n_bad, ok) */
  def fkCheck(name: String, child: DataFrame, childKey: String,
              parent: DataFrame, parentKey: String): DataFrame = {
    val orphans = child.select(col(childKey).as("__k"))
      .join(parent.select(col(parentKey).as("__k")), Seq("__k"), "left_anti")
      .agg(count(lit(1)).as("n_bad"))
    val total = child.agg(count(lit(1)).as("n_rows"))
    total.crossJoin(orphans) // 1 row × 1 row
      .select(lit(name).as("check_name"), col("n_rows"), col("n_bad"),
        (col("n_bad") === 0L).as("ok"))
  }

  /** One primary-key uniqueness check. @return 1 row, same shape:
    * n_bad = rows carrying a duplicated (or NULL) key.
    */
  def pkCheck(name: String, df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "pkCheck needs at least one key column")
    val keyed = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__n"))
    keyed.agg(
      sum(col("__n")).as("n_rows"),
      sum(when(col("__n") > 1 ||
        keyCols.map(col(_).isNull).reduce(_ || _), col("__n"))
        .otherwise(lit(0L))).as("n_bad"))
      .select(lit(name).as("check_name"), col("n_rows"), col("n_bad"),
        (col("n_bad") === 0L).as("ok"))
  }

  /** Union an audit suite into one verdict table. */
  def audit(checks: Seq[DataFrame]): DataFrame = {
    require(checks.nonEmpty, "audit needs at least one check")
    checks.reduce(_.unionByName(_))
  }

  /** Foreign-key CANDIDATE inference — the data-discovery flip side of
    * [[fkCheck]]'s declared-constraint audit: for a (child, parent)
    * column pair, how much of the child's distinct value set the
    * parent contains (containment 1.0 = a valid FK target) plus the
    * key-cardinality ratio. Exact distinct counts and one semi-join
    * per pair (both key-partitioned aggregations — profiling a 100 TB
    * fact table shuffles keys, never rows); all ratios divide exact
    * integers.
    *
    * @return one row per pair: (pair_name, n_child_distinct,
    *   n_parent_distinct, n_contained, containment, is_candidate)
    */
  def fkCandidates(
      pairs: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    require(pairs.nonEmpty, "fkCandidates needs at least one pair")
    pairs.map { case (name, child, ck, parent, pk) =>
      val cd = child.select(col(ck).as("__k")).filter(col("__k").isNotNull)
        .distinct()
      val pd = parent.select(col(pk).as("__k")).filter(col("__k").isNotNull)
        .distinct()
      val contained = cd.join(pd, Seq("__k"), "left_semi")
        .agg(count(lit(1)).as("n_contained"))
      cd.agg(count(lit(1)).as("n_child_distinct"))
        .crossJoin(pd.agg(count(lit(1)).as("n_parent_distinct")))
        .crossJoin(contained)
        .select(lit(name).as("pair_name"), col("n_child_distinct"),
          col("n_parent_distinct"), col("n_contained"),
          round(col("n_contained") / col("n_child_distinct"), 6)
            .as("containment"),
          (col("n_contained") === col("n_child_distinct"))
            .as("is_candidate"))
    }.reduce(_.unionByName(_))
  }
}
