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

  /** Event-transition matrix — the Markov "what happens next" flow
    * behind Sankey / path-analysis views: for consecutive events
    * within each user's timeline, the count and conditional
    * probability P(next | current).
    *
    * ONE user-keyed window (lead over the deterministic
    * (ts, event_id) order — the shuffle every event-analytics op
    * already pays) feeding a (from, to) count aggregate; the
    * per-source totals ride a second tiny aggregate joined back.
    * Output is event-vocabulary² rows whatever the history size.
    *
    * @return (from_type, to_type, n, prob) — prob rounded 1e-6
    */
  def transitions(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val pairs = events
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("from_type").agg(sum("n").as("n_from"))
    pairs.join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("n_from"), 6).as("prob"))
  }

  /** Frequent 3-itemsets with the classic APRIORI candidate prune:
    * triples are generated ONLY by extending frequent pairs, and every
    * sub-pair of a candidate must itself be frequent — the downward-
    * closure property makes the prune lossless (any frequent triple's
    * sub-pairs are at least as frequent), which the direct-count
    * DuckDB oracle proves on every run. `lift3` compares the joint
    * share against full independence.
    *
    * Scale shape: candidate generation is frequent-pair ⋈ basket (one
    * item extension, never a 3-way raw self-join); the two sub-pair
    * prunes are broadcast semi-joins against the (bounded) frequent
    * pair list; supports broadcast into the final projection.
    *
    * @return (item_a, item_b, item_c, support, lift3), a < b < c
    */
  def tripleRules(df: DataFrame, basketCol: String, itemCol: String,
                  minSupport: Long = 2L): DataFrame = {
    require(minSupport >= 1L, s"minSupport must be >= 1, got $minSupport")
    val baskets = df.select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .distinct()
    val nBaskets = baskets.agg(countDistinct(col("basket")).as("n_baskets"))
    val itemSupp = baskets.groupBy("item").agg(count(lit(1)).as("supp"))
    val fPairs = baskets.as("a")
      .join(baskets.as("b"), col("a.basket") === col("b.basket")
        && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("pa"), col("b.item").as("pb"))
      .agg(count(lit(1)).as("ps"))
      .filter(col("ps") >= minSupport)
      .select("pa", "pb")
    val cand = fPairs
      .join(baskets.as("p1"), col("p1.item") === col("pa"))
      .join(baskets.as("p2"), col("p2.item") === col("pb")
        && col("p2.basket") === col("p1.basket"))
      .join(baskets.as("c"), col("c.basket") === col("p1.basket")
        && col("c.item") > col("pb"))
      .select(col("pa").as("item_a"), col("pb").as("item_b"),
        col("c.item").as("item_c"), col("p1.basket").as("basket"))
    val pruned = cand
      .join(broadcast(fPairs.select(col("pa").as("item_b"), col("pb").as("item_c"))),
        Seq("item_b", "item_c"), "left_semi")
      .join(broadcast(fPairs.select(col("pa").as("item_a"), col("pb").as("item_c"))),
        Seq("item_a", "item_c"), "left_semi")
    val triples = pruned.groupBy("item_a", "item_b", "item_c")
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    triples
      .join(broadcast(itemSupp.select(col("item").as("item_a"), col("supp").as("sa"))), "item_a")
      .join(broadcast(itemSupp.select(col("item").as("item_b"), col("supp").as("sb"))), "item_b")
      .join(broadcast(itemSupp.select(col("item").as("item_c"), col("supp").as("sc"))), "item_c")
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("item_c"), col("support"),
        round(col("support").cast("double") * col("n_baskets") * col("n_baskets")
          / (col("sa") * col("sb") * col("sc")), 6).as("lift3"))
  }
}
