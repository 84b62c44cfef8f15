package graft

import graft.ops.Ranking
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global rank / ntile without a single-task window: value parity with
  * the textbook unpartitioned-Window formulation, and the plan shape
  * that makes it survive scale (range exchange shared via
  * ReusedExchange; no full-data single-partition Exchange).
  */
class RankingSpec extends SparkSpec {
  import spark.implicits._

  // non-trivial key distribution incl. heavy ties on the primary key;
  // doc_id makes the order total
  private def docs = (1L to 997L).map(i => (i, (i * 7919 % 23).toDouble))
    .toDF("doc_id", "score")

  test("globalRank matches row_number over the global order") {
    val got = Ranking.rank(docs, Seq(col("score"), col("doc_id")), "rank", 7)
      .select("doc_id", "rank")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = docs.withColumn("rank",
        row_number().over(Window.orderBy(col("score"), col("doc_id"))).cast("long"))
      .select("doc_id", "rank")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("globalNtile matches ntile for even and uneven bucket counts") {
    for (n <- Seq(4, 10, 13, 997, 1500)) {
      val got = Ranking.globalNtile(docs, Seq(col("score"), col("doc_id")), n,
          numPartitions = 5)
        .select("doc_id", "bin")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val want = docs.withColumn("bin",
          ntile(n).over(Window.orderBy(col("score"), col("doc_id"))))
        .select("doc_id", "bin")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == want, s"buckets=$n")
    }
  }

  test("rank is exact with empty range partitions") {
    // 3 distinct keys into 8 requested partitions -> most are empty
    val tiny = Seq((1L, 5.0), (2L, 5.0), (3L, 1.0)).toDF("doc_id", "score")
    val got = Ranking.rank(tiny, Seq(col("score"), col("doc_id")), "rank", 8)
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(3L, 1L, 2L))
  }

  test("plan: data shuffles once (ReusedExchange), no single-partition sort") {
    val dir = java.nio.file.Files.createTempDirectory("ranking").toString
    docs.write.mode("overwrite").parquet(dir)
    val plan = Ranking.rank(spark.read.parquet(dir),
        Seq(col("score"), col("doc_id")), "rank", 7)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("ReusedExchange") || plan.split("rangepartitioning").length - 1 <= 2, plan)
    // the full data must never pass through SinglePartition
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }

  test("globalCumsum equals the single-window cumsum; budget keeps a prefix") {
    import org.apache.spark.sql.expressions.Window
    val df = (1L to 100L).map(i => (i, (i * 7 % 13) + 1.0, i % 5 + 1L))
      .toDF("id", "score", "toks")
    val got = graft.ops.Ranking.globalCumsum(df,
        Seq(col("score").desc, col("id")), "toks", "cum", numPartitions = 7)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val exp = df.withColumn("cum", sum(col("toks")).over(
        Window.partitionBy(pmod(col("id"), lit(1)))
          .orderBy(col("score").desc, col("id"))))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == exp)
    // budget selection is the exact prefix of the quality ordering
    val kept = graft.sampling.Sampling
      .budgetByTokens(df, "score", "toks", 60L, idCol = "id")
      .collect().map(_.getLong(0)).toSet
    val expectKept = df.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .sortBy { case (id, s, _) => (-s, id) }
      .scanLeft((0L, 0L)) { case ((_, acc), (id, _, t)) => (id, acc + t) }
      .tail.takeWhile(_._2 <= 60L).map(_._1).toSet
    assert(kept == expectKept && kept.nonEmpty)
  }

  test("groupedCumsum equals the per-group window cumsum under skew") {
    import org.apache.spark.sql.expressions.Window
    // heavy skew: group "big" holds 80% of the rows — exactly the
    // shape Window.partitionBy(group) funnels through one task and
    // groupedCumsum must not
    val rows = (1L to 200L).map { i =>
      (i, if (i <= 160) "big" else s"g${i % 4}", (i * 11 % 17) + 1L)
    }
    val df = rows.toDF("id", "g", "v")
    val got = graft.ops.Ranking
      .groupedCumsum(df, "g", Seq(col("id")), "v", "cum", numPartitions = 7)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cum")).toMap
    val exp = df.withColumn("cum", sum(col("v")).over(
        Window.partitionBy(col("g")).orderBy(col("id"))))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cum")).toMap
    assert(got == exp)
  }
}
