package graft

import java.sql.Timestamp

/** Closed-form fixtures for the engagement / audit batch: rolling
  * distinct actives, session paths, Pareto concentration, and the
  * star-schema integrity checks.
  */
class EngagementSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d 00:00:$sec%02d")

  test("rollingDistinctUsers: expanding 3-day window, sketch in envelope") {
    // day1: u1,u2 · day2: u2,u3 · day4: u1 (day3 silent, never emitted)
    val ev = Seq((1L, ts(1)), (2L, ts(1)), (2L, ts(2)), (3L, ts(2)),
      (1L, ts(4))).toDF("user_id", "ts")
    val got = relational.Engagement
      .rollingDistinctUsers(ev, windowDays = 3)
      .orderBy("day").collect()
      .map(r => (r.getLong(1), r.getBoolean(2)))
    // day1 → {u1,u2}=2; day2 → {u1,u2,u3}=3; day4 → days 2..4 = {u2,u3,u1}=3
    assert(got.toSeq === Seq((2L, true), (3L, true), (3L, true)))
  }

  test("sessionPaths: gap split, path cap, count-desc rank") {
    val ev = Seq(
      // u1 session 1: a,b 10 s apart; session 2 (2 h later): c
      (1L, 1L, ts(1, 0), "a"), (2L, 1L, ts(1, 10), "b"),
      (3L, 1L, Timestamp.valueOf("2024-01-01 02:30:00"), "c"),
      // u2: a,b again — "a>b" reaches count 2
      (4L, 2L, ts(2, 0), "a"), (5L, 2L, ts(2, 5), "b")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = relational.Engagement.sessionPaths(ev, gapSeconds = 3600)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(("a>b", 2L, 1L), ("c", 1L, 2L)))
  }

  test("sessionPaths: maxLen caps the recorded prefix") {
    val ev = (1 to 4).map(i => (i.toLong, 1L, ts(1, i), s"e$i"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = relational.Engagement
      .sessionPaths(ev, gapSeconds = 3600, maxLen = 2)
      .collect().map(_.getString(0))
    assert(got.toSeq === Seq("e1>e2"))
  }

  test("ltvCurve: cohorting, cents sums, cumulative per-user value") {
    // two users in the same cohort week; purchases in weeks 0 and 1
    val ev = Seq(
      (1L, ts(1), "view", 0.0), (1L, ts(2), "purchase", 10.0),
      (2L, ts(3), "view", 0.0), (2L, ts(10), "purchase", 5.0))
      .toDF("user_id", "ts", "event_type", "value")
    val got = relational.Engagement.ltvCurve(ev)
      .orderBy("age_week").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    // age 0: 10.0 revenue over 2 users → 5.0; age 1: +5.0 → 7.5
    assert(got.toSeq === Seq((0L, 2L, 10.0, 5.0), (1L, 2L, 5.0, 7.5)))
  }

  test("dedupImpact: per-source survival of the global keep-first dedup") {
    val docs = Seq(
      (1L, "alpha beta", "s1"), (2L, "alpha beta", "s2"), // dup of 1
      (3L, "gamma delta epsilon", "s2"),
      (4L, "Alpha   BETA", "s2") // normalizes to the same fingerprint
    ).toDF("doc_id", "text", "source")
    val got = dedup.Dedup.dedupImpact(docs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5))).toMap
    assert(got("s1") === (1L, 1L, 2L, 2L, 0.0))
    // s2: doc 2 and 4 both lose to doc 1's fingerprint keep
    assert(got("s2") === (3L, 1L, 7L, 3L, 0.666667))
  }

  test("paretoShare: two-bucket split with exact shares") {
    val df = Seq((1L, 40.0), (2L, 30.0), (3L, 20.0), (4L, 10.0))
      .toDF("cust", "rev")
    val got = relational.Profile.paretoShare(df, "rev", "cust", buckets = 2)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq === Seq((1L, 2L, 70.0, 0.7, 0.7),
      (2L, 2L, 30.0, 0.3, 1.0)))
  }

  test("fkCheck: orphan and NULL child keys count as violations") {
    val child = Seq(Some(1L), Some(2L), Some(9L), None).toDF("k")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = relational.Integrity.fkCheck("c_p", child, "k", parent, "pk")
      .collect().head
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)) ===
      ("c_p", 4L, 2L, false))
  }

  test("pkCheck: duplicated keys count every involved row") {
    val df = Seq(1L, 1L, 1L, 2L, 3L).toDF("id")
    val r = relational.Integrity.pkCheck("pk", df, Seq("id")).collect().head
    assert((r.getLong(1), r.getLong(2), r.getBoolean(3)) === (5L, 3L, false))
  }

  test("audit: unions one verdict row per check") {
    val parent = Seq(1L).toDF("pk")
    val child = Seq(1L, 2L).toDF("k")
    val out = relational.Integrity.audit(Seq(
      relational.Integrity.fkCheck("a", child, "k", parent, "pk"),
      relational.Integrity.pkCheck("b", parent, Seq("pk"))))
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(out === Map("a" -> false, "b" -> true))
  }
}
