package graft

import graft.relational.SkewJoin
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // 90% of the fact rows share one hot key; dim has one row per key
  private def fact = ((1 to 900).map(i => (7L, i.toDouble)) ++
    (1 to 100).map(i => (i.toLong % 5, i.toDouble)))
    .toDF("k", "v")
  private def dim = (0L to 9L).map(i => (i, s"name$i")).toDF("k", "name")

  test("saltedJoin inner matches the plain join on skewed keys") {
    val got = SkewJoin.saltedJoin(fact, dim, Seq("k"), saltFactor = 8)
      .select("k", "v", "name")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).sorted.toSeq
    val want = fact.join(dim, Seq("k"))
      .select("k", "v", "name")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).sorted.toSeq
    assert(got == want && got.size == 1000)
  }

  test("saltedJoin left keeps unmatched and null-key rows like a plain left join") {
    val factN = fact.unionByName(
      Seq((Option.empty[Long], -1.0), (Some(99L), -2.0))
        .toDF("k", "v"))
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .select("k", "v", "name")
      .collect().map(r => (Option(r.get(0)).map(_.toString), r.getDouble(1),
        Option(r.get(2)).map(_.toString))).sortBy(t => (t._2, t._1))
    val got = shape(SkewJoin.saltedJoin(factN, dim, Seq("k"), 4, joinType = "left"))
    val want = shape(factN.join(dim, Seq("k"), "left"))
    assert(got.toSeq == want.toSeq)
  }

  test("the hot key spreads over every salt value") {
    // the per-row draw must cycle a 900-row hot key through all 8
    // salts — a per-KEY draw would collapse to 1 and defeat salting
    val salts = fact.filter(col("k") === 7)
      .withColumn("s", SkewJoin.saltColumn(8))
      .select("s").distinct().count()
    assert(salts == 8L)
  }
}
