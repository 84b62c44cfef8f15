package graft

import graft.ops.PointwiseOps
import org.apache.spark.sql.functions._

/** Pins down arithmetic edge semantics under Spark 4's default ANSI
  * mode, which the reference's NumPy behaviour must survive.
  */
class DivSemanticsSpec extends SparkSpec {
  import spark.implicits._

  test("divideColumn follows NumPy zero semantics under ANSI (multi_column.py:38-46)") {
    val r = Seq((1.0, 0.0), (-1.0, 0.0), (0.0, 0.0), (6.0, 3.0))
      .toDF("a", "b")
      .select(PointwiseOps.divideColumn(col("a"), col("b")).as("q"))
      .collect().map(_.getDouble(0)).toSeq
    assert(r(0).isPosInfinity)
    assert(r(1).isNegInfinity)
    assert(r(2).isNaN)
    assert(r(3) == 2.0)
  }

  test("shingles survive texts shorter than the shingle width under ANSI") {
    val docs = Seq((1L, "single"), (2L, "two words"), (3L, "a b c d")).toDF("doc_id", "text")
    val sh = dedup.Dedup.shingles(docs, 3).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(sh.contains((1L, "single")))      // short doc -> partial shingle
    assert(sh.contains((2L, "two words")))
    assert(sh.contains((3L, "a b c")) && sh.contains((3L, "b c d")))
  }
}
