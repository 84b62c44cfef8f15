package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Ranking

/** RFM (recency / frequency / monetary) customer scoring — the classic
  * behavioral-segmentation primitive: quintile each customer on how
  * recently they ordered, how often, and how much, then concatenate
  * the three scores into a segment code (555 = best).
  *
  * Scale shape: the corpus-scale work is ONE map-side-combinable
  * aggregate over the orders fact (per-customer max-date / count /
  * sum); the anchor date is a 1-row aggregate broadcast into the
  * projection. The three quintile assignments run on the per-customer
  * table via [[Ranking.globalNtile]] — exact SQL `ntile` semantics
  * with a range repartition instead of the single-task unpartitioned
  * window, so the scoring never funnels customers through one reducer.
  */
object Rfm {

  /** Score each customer from an orders fact.
    *
    * Scores follow the marketing convention (5 = best): recency ntile
    * is taken over recency_days DESCENDING (most recent customers land
    * in bucket 5), frequency and monetary ASCENDING (highest land in
    * 5). Customer key breaks every tie, making all three orders total
    * and the output engine-independent.
    *
    * @return (cust, recency_days, frequency, monetary, r, f, m, rfm)
    */
  def rfm(orders: DataFrame, custCol: String, dateCol: String,
          amountCol: String, buckets: Int = 5): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    // monetary sums exact integer cents (the gini discipline): a float
    // sum's accumulation order shifts with partition layout, and both
    // the 1e-6-rounded output and the m-ntile ORDER would wobble at
    // boundary values
    val perCust = orders.groupBy(col(custCol).as("cust"))
      .agg(max(col(dateCol)).as("__last"),
        count(lit(1)).as("frequency"),
        (sum(round(col(amountCol) * 100).cast("long")) / 100.0)
          .as("monetary"))
    val anchor = orders.agg(max(col(dateCol)).as("__anchor"))
    val base = perCust.crossJoin(broadcast(anchor))
      .withColumn("recency_days",
        datediff(col("__anchor"), col("__last")).cast("long"))
      .drop("__last", "__anchor")
    val r = Ranking.globalNtile(base,
      Seq(col("recency_days").desc, col("cust")), buckets, "r")
    val f = Ranking.globalNtile(r,
      Seq(col("frequency"), col("cust")), buckets, "f")
    val m = Ranking.globalNtile(f,
      Seq(col("monetary"), col("cust")), buckets, "m")
    m.select(col("cust"), col("recency_days"), col("frequency"),
      col("monetary"), col("r"), col("f"), col("m"),
      (col("r") * 100 + col("f") * 10 + col("m")).as("rfm"))
  }
}
