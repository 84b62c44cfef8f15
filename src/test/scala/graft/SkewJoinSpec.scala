package graft
// (interval-overlap + weighted-sample specs live here too: the
// relational-join/sampling grab-bag suite)

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

  test("interval overlap join matches the naive predicate and emits each pair once") {
    // left interval spanning MANY bins (0..1000, binWidth 10 => 100
    // shared bins with right) must still emit exactly one match row
    val left = Seq((1L, 0L, 1000L), (2L, 50L, 60L), (3L, 2000L, 2100L))
      .toDF("lid", "ls", "le")
    val right = Seq((10L, 500L, 600L), (11L, 55L, 58L), (12L, 1000L, 1100L),
      (13L, 60L, 70L)).toDF("rid", "rs", "re")
    val got = graft.relational.RangeJoin
      .intervalOverlapJoin(left, right, "ls", "le", "rs", "re", binWidth = 10L)
      .select("lid", "rid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    // naive: overlap iff ls < re && rs < le (half-open)
    val l = left.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val rr = right.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = (for {
      (lid, ls, le) <- l; (rid, rs, re) <- rr
      if ls < re && rs < le
    } yield (lid, rid)).toSeq.sorted
    assert(got == want)
    // boundary: [50,60) and [60,70) do NOT overlap (half-open)
    assert(!got.contains((2L, 13L)))
    // the 100-shared-bin pair appears exactly once
    assert(got.count(_ == ((1L, 10L))) == 1)
  }

  test("containment catches subset duplication that symmetric Jaccard misses") {
    // the contained doc is a large-enough fraction of the big one that
    // the jaccard-tuned banding still recalls the pair (J ≈ 0.4 →
    // ≥1-of-12 band hit is near-certain and md5-deterministic), while
    // the CONTAINMENT asymmetry is what crosses the 0.9 threshold
    val small = (1 to 12).map(i => s"core$i").mkString(" ")
    val big = small + " " + (1 to 18).map(i => s"filler$i").mkString(" ")
    val docs = Seq((1L, small), (2L, big), (3L, "unrelated text entirely here"))
      .toDF("doc_id", "text")
    val out = graft.dedup.Dedup
      .containmentPairs(docs, shingleSize = 2, numHashes = 12,
        bandRows = 1, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val (ca, cb, j) = out((1L, 2L))
    assert(ca == 1.0, "the small doc is fully contained")
    assert(j < 0.5, s"symmetric Jaccard stays under any dedup threshold: $j")
    assert(cb < 0.5)
  }

  test("distribution drift: zero for identical versions, js_bits flags a dropped key") {
    val a = (0L until 90L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    val same = graft.sampling.Sampling.distributionDrift(a, a, "source")
      .collect().map(r => (r.getString(0), r.getDouble(5))).toMap
    assert(same.values.forall(_ == 0.0))
    // version B drops src2 entirely -> that key carries the drift
    val b = a.filter(col("source") =!= "src2")
    val drift = graft.sampling.Sampling.distributionDrift(a, b, "source")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(5))).toMap
    assert(drift("src2")._2 == 0L)
    assert(drift("src2")._3 > drift("src0")._3)
    assert(drift.values.map(_._3).sum > 0.05) // real divergence in bits
  }

  test("pagerank: mass conserved, cycle uniform, hubs outrank leaves, partition-invariant") {
    // star: hub 0 connected to 1..6 — hub rank must dominate
    val star = (1L to 6L).map(i => (0L, i)).toDF("id_a", "id_b")
    val ranks = graft.graphs.PageRank.pageRank(star, iters = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(ranks.values.sum - 1.0) < 1e-4, s"mass: ${ranks.values.sum}")
    assert(ranks(0L) > 2 * ranks(1L))
    assert((1L to 6L).map(ranks).distinct.size == 1) // leaves symmetric
    // 4-cycle: perfectly symmetric -> uniform 0.25
    val cycle = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)).toDF("id_a", "id_b")
    val cr = graft.graphs.PageRank.pageRank(cycle, iters = 8)
      .collect().map(_.getDouble(1))
    assert(cr.forall(v => math.abs(v - 0.25) < 1e-6))
    // partitioning invariance (the rounded recurrence is layout-proof)
    def of(parts: Int) = graft.graphs.PageRank
      .pageRank(star.repartition(parts), iters = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(of(2) == of(7))
  }

  test("last-touch attribution credits the latest prior-or-simultaneous touchpoint") {
    val rows = Seq(
      (1L, 10L, "view", 100L), (1L, 20L, "click", 101L),
      (1L, 30L, "purchase", 102L),           // -> click@20
      (1L, 40L, "purchase", 103L),           // -> still click@20
      (2L, 50L, "purchase", 200L),           // no prior touch -> NULL
      (3L, 60L, "view", 300L), (3L, 60L, "click", 301L),
      (3L, 60L, "purchase", 302L))           // tie at t=60 -> max event_id (click)
    val ev = rows.toDF("user_id", "sec", "event_type", "event_id")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val out = graft.relational.Attribution.lastTouch(ev)
      .collect().map(r => r.getLong(2) -> Option(r.getString(3))).toMap
    assert(out == Map(102L -> Some("click"), 103L -> Some("click"),
      200L -> None, 302L -> Some("click")))
  }

  test("profile reports one-pass stats per column, long format") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 10.0), (2.0, null), (3.0, 30.0), (4.0, 40.0))
      .toDF("a", "b")
    val p = graft.relational.Profile.profile(df, Seq("a", "b"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6))).toMap
    assert(p("a") == ((4L, 0L, 1.0, 4.0, 2.5, 2.5)))
    assert(p("b") == ((3L, 1L, 10.0, 40.0, 26.666667, 30.0)))
  }

  test("weighted sample is deterministic, k-bounded, and favours heavy weights") {
    val docs = (0L until 400L)
      .map(i => (i, s"t$i", if (i < 20) 1000.0 else 1.0))
      .toDF("doc_id", "text", "w")
    def ids(salt: String) = graft.sampling.Sampling
      .weightedSample(docs, "w", k = 30, salt = salt)
      .collect().map(_.getLong(0)).toSet
    val a = ids("s1")
    assert(a == ids("s1") && a.size == 30)  // deterministic, exactly k
    assert(a != ids("s2"))                  // salt changes the draw
    // the 20 heavy docs carry 1000/1380 of the mass each pick — with
    // k=30 essentially all of them are drawn
    assert((a & (0L until 20L).toSet).size >= 18)
    // zero/negative weights are excluded outright
    val z = graft.sampling.Sampling.weightedSample(
        docs.withColumn("w", when(col("doc_id") < 395, 0.0).otherwise(col("w"))),
        "w", k = 30, salt = "s3")
      .collect().map(_.getLong(0)).toSet
    assert(z.forall(_ >= 395L) && z.size == 5)
  }
}
