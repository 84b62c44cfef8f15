package graft

import graft.relational.Scd
import org.apache.spark.sql.functions._

/** Specs for the SCD2 snapshot merge. */
class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def run(base: Seq[(Long, Option[Double], String)],
                  upd: Seq[(Long, Option[Double], String)]) =
    Scd.scd2Merge(
      base.toDF("k", "price", "status"),
      upd.toDF("k", "price", "status"),
      "k", Seq("price", "status"), baseSeq = 1L, updSeq = 2L)
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getInt(5)))
      .sortBy(t => (t._1, t._4))

  test("scd2Merge: unchanged, changed, inserted, and absent-from-update keys") {
    val out = run(
      base = Seq((1L, Some(10.0), "A"), (2L, Some(20.0), "A"), (3L, Some(30.0), "A")),
      upd = Seq((2L, Some(25.0), "A"), (3L, Some(30.0), "A"), (4L, Some(40.0), "B")))
    assert(out.toSeq == Seq(
      (1L, Some(10.0), "A", 1L, None, 1),           // not in update → current
      (2L, Some(20.0), "A", 1L, Some(2L), 0),       // closed old version
      (2L, Some(25.0), "A", 2L, None, 1),           // opened new version
      (3L, Some(30.0), "A", 1L, None, 1),           // unchanged → no-op
      (4L, Some(40.0), "B", 2L, None, 1)))          // insert
  }

  test("scd2Merge versions null→value and value→null transitions") {
    val out = run(
      base = Seq((1L, None, "A"), (2L, Some(2.0), "A")),
      upd = Seq((1L, Some(1.0), "A"), (2L, None, "A")))
    // both keys change (null-safe comparison), each → closed + current
    assert(out.count(_._6 == 0) == 2)
    assert(out.filter(_._1 == 1L).map(t => (t._2, t._6)).toSet ==
      Set((None, 0), (Some(1.0), 1)))
    assert(out.filter(_._1 == 2L).map(t => (t._2, t._6)).toSet ==
      Set((Some(2.0), 0), (None, 1)))
  }

  test("snapshotDiff counts a NULL-position value swap as CHANGED " +
      "(explicit NULL sentinel in the row hash)") {
    // (x, NULL) → (NULL, x): concat_ws alone would render both rows as
    // just "x" and hash them equal — the silent-unchanged advice bug
    val before = Seq((1L, Option("x"), Option.empty[String]),
      (2L, Option("a"), Option("b")))
      .toDF("k", "v1", "v2")
    val after = Seq((1L, Option.empty[String], Option("x")),
      (2L, Option("a"), Option("b")))
      .toDF("k", "v1", "v2")
    val r = Scd.snapshotDiff(before, after, Seq("k"), Seq("v1", "v2"))
      .collect().head
    assert(r.getAs[Long]("changed") === 1L, r.toString)
    assert(r.getAs[Long]("unchanged") === 1L, r.toString)
    assert(r.getAs[Long]("added") === 0L && r.getAs[Long]("removed") === 0L,
      r.toString)
  }

  test("scd2Merge with identical base and update is a pure pass-through") {
    val rows = Seq((1L, Some(1.0), "A"), (2L, Some(2.0), "B"))
    val out = run(rows, rows)
    assert(out.forall(t => t._6 == 1 && t._4 == 1L && t._5.isEmpty))
    assert(out.length == 2)
  }
}
