package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association mining — pairwise co-occurrence rules
  * (support / confidence / lift) over (basket, item) observations:
  * which items appear together more than chance predicts. The classic
  * recommendation / behavioral-analytics primitive (users who `view`
  * also `purchase`), and in corpus work the same shape scores
  * source/tag co-occurrence.
  *
  * Scale shape: baskets dedup to distinct (basket, item) with ONE
  * map-side-combinable aggregate; the pair generation is a self-join
  * keyed on basket whose fan-out is bounded by the per-basket distinct
  * item count k (k² pairs per basket, never corpus²); item supports
  * are a tiny table broadcast into the final scoring projection. With
  * a bounded item vocabulary the pair table is vocabulary², regardless
  * of corpus size.
  */
object Association {

  /** Pairwise rules over unordered item pairs (item_a < item_b).
    *
    * Output: item_a, item_b, pair_support (baskets containing both),
    * conf_a_to_b = P(b|a), conf_b_to_a = P(a|b), and
    * lift = P(a,b) / (P(a)·P(b)) — all ratios of exact longs, rounded
    * 1e-6 on output.
    */
  def pairRules(df: DataFrame, basketCol: String, itemCol: String,
                minSupport: Long = 1L): DataFrame = {
    require(minSupport >= 1L, s"minSupport must be >= 1, got $minSupport")
    val baskets = df.select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .distinct()
    val nBaskets = baskets.agg(
      countDistinct(col("basket")).as("n_baskets"))
    val itemSupp = baskets.groupBy("item")
      .agg(count(lit(1)).as("supp"))
    val pairs = baskets.as("a")
      .join(baskets.as("b"), col("a.basket") === col("b.basket")
        && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("item_a"), col("b.item").as("item_b"))
      .agg(count(lit(1)).as("pair_support"))
      .filter(col("pair_support") >= minSupport)
    pairs
      .join(broadcast(itemSupp.withColumnRenamed("item", "item_a")
        .withColumnRenamed("supp", "supp_a")), "item_a")
      .join(broadcast(itemSupp.withColumnRenamed("item", "item_b")
        .withColumnRenamed("supp", "supp_b")), "item_b")
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("pair_support"),
        round(col("pair_support").cast("double") / col("supp_a"), 6)
          .as("conf_a_to_b"),
        round(col("pair_support").cast("double") / col("supp_b"), 6)
          .as("conf_b_to_a"),
        round(col("pair_support").cast("double") * col("n_baskets")
          / (col("supp_a") * col("supp_b")), 6).as("lift"))
  }
}
