package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A hash-partitioned join sends every row of a key to ONE reducer, so
  * a hot key (the null-ish placeholder user, the top domain, the empty
  * document) caps the join at single-task speed no matter the cluster
  * size. AQE's skew-join rescue handles the SortMergeJoin case at
  * runtime, but only for joins — and only after the skewed shuffle
  * files exist.
  *
  * Salting fixes the layout statically: the BIG side's rows gain a
  * uniform salt in [0, saltFactor), the SMALL side replicates each row
  * saltFactor times (one per salt value), and the join runs on
  * (key, salt) — every hot key now spreads over `saltFactor` reducers.
  * Cost: the small side shuffles ×saltFactor, which is the right trade
  * exactly when small ≪ big (a dimension into a fact table) but the
  * small side is too large or too dynamic to broadcast outright.
  *
  * The salt must vary PER ROW of the big side — a draw from the key
  * alone would send every row of the hot key to one salt and change
  * nothing. The join output is salt-independent (the salt only routes
  * rows to reducers), so any uniform per-row draw yields the same
  * result; the row-index draw below is additionally stable given a
  * stable scan order.
  */
object SkewJoin {

  /** The per-row salt draw: row-index-within-partition mod saltFactor.
    * Adjacent rows cycle through every salt value, so even a hot key
    * concentrated in one input partition spreads evenly.
    */
  def saltColumn(saltFactor: Int): Column =
    pmod(monotonically_increasing_id(), lit(saltFactor.toLong)).cast("int")

  /** Inner/left equi-join of `big` to `small` on `keys`, salted
    * `saltFactor` ways. Output columns: all of `big` plus the non-key
    * columns of `small` (the usual enrich-fact-with-dim shape).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"saltedJoin supports inner/left joins, got $joinType" +
        " (a right/full join would need the salt on the other side)")
    val drawn = big.withColumn("__salt", saltColumn(saltFactor))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    drawn.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
