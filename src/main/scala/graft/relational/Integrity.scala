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
}
