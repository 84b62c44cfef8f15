package graft

import graft.ops.Ranking
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regression for the r9 q_rfm gate failure: `globalRank`'s
  * per-partition-count branch and local-index branch each planned
  * their own range `Exchange`; when Catalyst's `ReuseExchange` did not
  * fire (column-pruning divergence at 32 shuffle partitions), the two
  * exchanges sampled DIFFERENT boundaries and quintiles of 1500 rows
  * came out 300/316/304/286/294 instead of 5×300. The fix pins one
  * physical layout via an eager localCheckpoint; these specs assert
  * bit-equality with the single-task window ntile on the shapes that
  * failed — chained ntiles, many partitions, parquet input.
  */
class ChainedNtileRepro extends SparkSpec {
  import spark.implicits._

  test("repro: three chained globalNtiles match chained window ntiles") {
    val base = (1L to 997L).map(i =>
      (i, (i * 7919 % 23).toDouble, (i * 104729 % 17).toLong, (i * 31 % 101).toDouble))
      .toDF("cust", "recency", "freq", "money")
    val got = {
      val r = Ranking.globalNtile(base, Seq(col("recency").desc, col("cust")), 5, "r", numPartitions = 32)
      val f = Ranking.globalNtile(r, Seq(col("freq"), col("cust")), 5, "f", numPartitions = 32)
      Ranking.globalNtile(f, Seq(col("money"), col("cust")), 5, "m", numPartitions = 32)
    }.select("cust", "r", "f", "m").collect()
      .map(x => x.getLong(0) -> (x.getInt(1), x.getInt(2), x.getInt(3))).toMap
    val want = base
      .withColumn("r", ntile(5).over(Window.orderBy(col("recency").desc, col("cust"))))
      .withColumn("f", ntile(5).over(Window.orderBy(col("freq"), col("cust"))))
      .withColumn("m", ntile(5).over(Window.orderBy(col("money"), col("cust"))))
      .select("cust", "r", "f", "m").collect()
      .map(x => x.getLong(0) -> (x.getInt(1), x.getInt(2), x.getInt(3))).toMap
    val bad = got.filter { case (k, v) => want(k) != v }
    assert(bad.isEmpty, s"${bad.size} mismatches, e.g. ${bad.take(5)} want ${bad.take(5).keys.map(want)}")
  }

  test("repro: rfm quintiles on sf0.01 orders match window ntiles at 32 partitions") {
    val orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    val perCust = orders.groupBy(col("o_custkey").as("cust"))
      .agg(max(col("o_orderdate")).as("__last"),
        count(lit(1)).as("frequency"),
        round(sum(col("o_totalprice")), 6).as("monetary"))
    val anchor = orders.agg(max(col("o_orderdate")).as("__anchor"))
    val base = perCust.crossJoin(broadcast(anchor))
      .withColumn("recency_days",
        datediff(col("__anchor"), col("__last")).cast("long"))
      .drop("__last", "__anchor")
    val got = {
      val r = Ranking.globalNtile(base, Seq(col("recency_days").desc, col("cust")), 5, "r", numPartitions = 32)
      Ranking.globalNtile(r, Seq(col("frequency"), col("cust")), 5, "f", numPartitions = 32)
    }.select("cust", "r", "f").collect()
      .map(x => x.getLong(0) -> (x.getInt(1), x.getInt(2))).toMap
    val want = base
      .withColumn("r", ntile(5).over(Window.orderBy(col("recency_days").desc, col("cust"))))
      .withColumn("f", ntile(5).over(Window.orderBy(col("frequency"), col("cust"))))
      .select("cust", "r", "f").collect()
      .map(x => x.getLong(0) -> (x.getInt(1), x.getInt(2))).toMap
    val bad = got.filter { case (k, v) => want(k) != v }
    assert(bad.isEmpty, s"${bad.size} mismatches, e.g. ${bad.take(5)}")
    // every quintile must be exactly 1/5 of the customers (count is a
    // multiple of 5 in this dataset — the property the bug broke)
    val sizes = got.values.groupBy(_._2).view.mapValues(_.size).toMap
    assert(sizes.values.toSet.size == 1, s"uneven f-quintiles: $sizes")
  }
}
