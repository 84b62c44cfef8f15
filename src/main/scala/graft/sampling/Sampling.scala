package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling for corpus pipelines.
  *
  * Both operators draw a uniform value per row from
  * `md5(key ':' salt)` and compare it lexicographically against
  * 32-hex-digit thresholds — a reproducible Bernoulli draw that is a
  * pure scan-side filter: no shuffle, no RNG state, identical output
  * regardless of partitioning, cluster size, or engine (unlike
  * `DataFrame.sample`, whose result depends on how rows land in
  * partitions). Different salts give independent draws; the same salt
  * always reproduces the same sample — what train/eval splits and
  * corpus ablations need at 100 TB, where "re-run the sample" is a
  * full scan.
  */
object Sampling {

  /** floor(fraction · 16³²) as a zero-padded 32-digit hex literal —
    * md5 hex strings are uniform over [0, 16³²), and lexicographic
    * order on equal-length lowercase hex IS numeric order, so
    * `md5 < thresholdHex(f)` keeps fraction f of rows.
    */
  def thresholdHex(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"fraction must be in [0, 1], got $fraction")
    val t = (BigDecimal(fraction) * BigDecimal(BigInt(16).pow(32))).toBigInt
    ("0" * 32 + t.toString(16)).takeRight(32)
  }

  /** The per-row uniform draw. */
  def hashKey(key: Column, salt: String): Column =
    md5(concat(key.cast("string"), lit(":" + salt)))

  /** Keep ~`fraction` of rows, deterministically by `keyCol`. */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double,
                 salt: String): DataFrame =
    if (fraction >= 1.0) df
    else df.filter(hashKey(col(keyCol), salt) < lit(thresholdHex(fraction)))

  /** Assign every row to a named split with the given weights
    * (normalised to 1), deterministically by `keyCol` — e.g.
    * `Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)`. Adds a
    * `split` column; the draw happens once, so the splits are exactly
    * disjoint and exhaustive.
    */
  def hashSplit(df: DataFrame, keyCol: String,
                splits: Seq[(String, Double)], salt: String): DataFrame = {
    val key = hashKey(col(keyCol), salt)
    // the last split takes everything remaining — no row can fall
    // through on weight rounding
    val expr = splits.init.map(_._1).zip(splitThresholds(splits))
      .foldRight(lit(splits.last._1): Column) {
        case ((name, hi), acc) => when(key < lit(hi), name).otherwise(acc)
      }
    df.withColumn("split", expr)
  }

  /** Stratified deterministic sampling: keep a different fraction per
    * stratum (e.g. per language — upsample scarce languages, trim the
    * dominant one), with the same reproducible md5 draw as
    * `hashSample`. Strata absent from `fractions` keep
    * `defaultFraction`. Still a pure scan-side filter: no shuffle, no
    * per-stratum pass — one scan whatever the stratum count.
    */
  def hashSampleStratified(df: DataFrame, keyCol: String,
                           stratumCol: String,
                           fractions: Seq[(String, Double)],
                           defaultFraction: Double,
                           salt: String): DataFrame = {
    val key = hashKey(col(keyCol), salt)
    // fraction 1.0 must keep EVERYTHING: thresholdHex(1.0) wraps to
    // the all-zeros string (16^32 has 33 hex digits), which would
    // silently drop the whole stratum. 'g' sorts above every hex
    // digit, so it is an always-true bound.
    def bound(f: Double): String = if (f >= 1.0) "g" else thresholdHex(f)
    val b = fractions.foldRight(lit(bound(defaultFraction)): Column) {
      case ((stratum, f), acc) =>
        when(col(stratumCol) === stratum, lit(bound(f))).otherwise(acc)
    }
    df.filter(key < b)
  }

  /** Balanced subset selection: the `k` rows of each stratum with the
    * smallest salted md5 draws — a deterministic per-stratum "random"
    * top-k (equal-size per-language corpora, eval-slice carving).
    * Unlike fraction-based sampling, the output size per stratum is
    * EXACT (min(k, stratum size)).
    *
    * Scale shape: one shuffle on the stratum key into a rank window.
    * The hash order is uniform, so window partitions are balanced
    * across strata of equal size; a dominant stratum is one partition —
    * for corpus-scale strata prefer `hashSample` (scan-side, no
    * shuffle) and accept approximate sizes.
    */
  def hashTopKPerStratum(df: DataFrame, keyCol: String, stratumCol: String,
                         k: Int, salt: String): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(hashKey(col(keyCol), salt), col(keyCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** The n−1 upper-bound hex thresholds of `hashSplit`'s bands,
    * exposed so an external checker can reproduce the exact same
    * literals (the cumulative float sums must match bit-for-bit).
    */
  def splitThresholds(splits: Seq[(String, Double)]): Seq[String] = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "splits must be non-empty with positive weights")
    val total = splits.map(_._2).sum
    splits.scanLeft(0.0)(_ + _._2 / total).tail.init.map(thresholdHex)
  }
}
