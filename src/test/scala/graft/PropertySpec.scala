package graft

import graft.ops.TemporalOps
import graft.spatial.{Grid, KernelLag}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based tests (SURVEY §5 strategy #4): algebraic invariants of
  * the window and spatial families over ScalaCheck-generated panels
  * (sampled deterministically — seeded — so failures reproduce).
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  import spark.implicits._
  private val T = Panel.TimeCol
  private val U = Panel.UnitCol

  private val seriesGen: Gen[List[Double]] =
    Gen.chooseNum(4, 16).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(Gen.const(0.0), Gen.chooseNum(-50.0, 50.0))))

  /** Deterministic forAll: `count` seeded samples of `gen`. */
  private def forAll[A](gen: Gen[A], count: Int = 10)(body: A => Unit): Unit =
    (0 until count).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }

  private def gen2[A, B](a: Gen[A], b: Gen[B]): Gen[(A, B)] =
    a.flatMap(x => b.map(y => (x, y)))
  private def gen3[A, B, C](a: Gen[A], b: Gen[B], c: Gen[C]): Gen[(A, B, C)] =
    a.flatMap(x => b.flatMap(y => c.map(z => (x, y, z))))

  private def panel1(vs: Seq[Double]) =
    vs.zipWithIndex.map { case (v, i) => (i + 1L, 1L, v) }.toDF(T, U, "value")

  test("tlead(tlag(s,k),k) restores interior rows") {
    forAll(gen2(seriesGen, Gen.chooseNum(1, 3))) { case (vs, k) =>
      if (vs.length > k) {
        val p = panel1(vs)
        val out = p.select(col(T),
            TemporalOps.tlead(TemporalOps.tlag(col("value"), k), k).as("r"))
          .orderBy(T).collect()
        // interior rows (those with both shifts defined) must round-trip
        vs.indices.drop(k).dropRight(k).foreach { i =>
          assert(out(i).getDouble(1) == vs(i), s"row $i of $vs")
        }
      }
    }
  }

  test("moving_sum window additivity: msum_w = msum_a + lagged msum_b (w=a+b)") {
    forAll(gen3(seriesGen, Gen.chooseNum(1, 3), Gen.chooseNum(1, 3))) {
      case (vs, a, b) =>
      val w = a + b
      val p = panel1(vs)
      val out = p.select(col(T), col("value"),
          TemporalOps.movingSum(col("value"), w).as("mw"),
          (TemporalOps.movingSum(col("value"), b) +
            coalesce(TemporalOps.tlag(TemporalOps.movingSum(col("value"), a), b), lit(0.0))).as("split"))
        .orderBy(T).collect()
      out.foreach { r =>
        assert(math.abs(r.getDouble(2) - r.getDouble(3)) < 1e-9,
          s"additivity failed for $vs a=$a b=$b")
      }
    }
  }

  test("cweq: value equal to v increments or resets; counter bounded by prefix") {
    forAll(seriesGen) { vs =>
      val p = panel1(vs)
      val out = TemporalOps.cweq(p, "value", 0.0).orderBy(T)
        .select("cweq").collect().map(_.getInt(0))
      var run = 0
      vs.zip(out).foreach { case (v, c) =>
        run = if (v == 0.0) run + 1 else 0
        assert(c == run, s"cweq mismatch for $vs")
      }
    }
  }

  test("temporal entropy lies in [0, log2(window)]") {
    forAll(gen2(seriesGen, Gen.chooseNum(2, 6))) { case (vs, w) =>
      val p = panel1(vs.map(math.abs)) // entropy needs non-negative inputs
      val out = p.select(col(T),
          TemporalOps.temporalEntropy(col("value"), w, 1.0).as("h"))
        .orderBy(T).collect().map(_.getDouble(1))
      out.foreach { h =>
        assert(h >= -1e-9 && h <= math.log(w) / math.log(2) + 1e-9,
          s"entropy $h out of bounds for $vs w=$w")
      }
    }
  }

  test("asofJoin equals the reference backward-scan on random event sets") {
    val caseGen = gen2(
      Gen.listOfN(30, gen2(Gen.chooseNum(1L, 3L), Gen.chooseNum(0L, 40L))),
      Gen.listOfN(12, gen3(Gen.chooseNum(1L, 3L), Gen.chooseNum(0L, 40L),
        Gen.chooseNum(-9.0, 9.0))))
    forAll(caseGen, count = 6) { case (leftRaw, rightRaw) =>
      // right unique per (key, time) — the operator's contract
      val right = rightRaw.groupBy(r => (r._1, r._2))
        .map { case ((k, t), rs) => (k, t, rs.map(_._3).max) }.toSeq
      val left = leftRaw.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val got = graft.relational.AsofJoin.asofJoin(
          left.toDF("k", "t", "lid"), right.toDF("k", "t", "v"),
          "k", "t", Seq("v"))
        .collect().map(r => r.getLong(2) ->
          (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
      val want = left.map { case (k, t, lid) =>
        val prior = right.filter(r => r._1 == k && r._2 <= t)
        lid -> (if (prior.isEmpty) None
                else Some(prior.maxBy(_._2)._3))
      }.toMap
      assert(got == want)
    }
  }

  test("spacetime: k=1 distance equals the minimum of the k=5 candidates") {
    // the bounded top-k path and the codegen'd min path must agree on
    // the nearest event for every (month, cell)
    forAll(seriesGen, count = 4) { vs =>
      val p = vs.zipWithIndex.flatMap { case (v, i) =>
        (0L until 4L).map(u => (i + 1L, u, if (u == 1) math.abs(v) else 0.0))
      }.toDF(T, U, "value")
        .withColumn("lon", Grid.unitLon(col(U)))
        .withColumn("lat", Grid.unitLat(col(U)))
      val k1 = spatial.SpacetimeDist.spacetimeDistances(
          p, "value", "distances", 1, 1.0, 0.0)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val k5 = spatial.SpacetimeDist.spacetimeDistances(
          p, "value", "distances", 5, 1.0, 0.0)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      // mean over <=5 nearest >= the single nearest; sentinels align
      k1.foreach { case (key, d1) =>
        val d5 = k5(key)
        assert((d1 == 999.0) == (d5 == 999.0), s"sentinel mismatch at $key")
        if (d1 != 999.0) assert(d5 >= d1 - 1e-12, s"$key: mean $d5 < min $d1")
      }
    }
  }

  test("adaptive mesh covers every unit exactly once at any threshold") {
    forAll(gen2(seriesGen, Gen.chooseNum(1.0, 80.0)), count = 4) { case (vs, thr) =>
      val units = Seq(0L, 1L, 2L, 40L, 41L, 80L)
      val p = vs.take(4).zipWithIndex.flatMap { case (v, i) =>
        units.map(u => (i + 1L, u, math.abs(v) * (u % 3 + 1)))
      }.toDF(T, U, "value")
      val emb = spatial.TreeLag.embed(units.map(u =>
        (u, (u % 40).toInt, (u / 40).toInt)))
      val mesh = spatial.TreeLag.adaptiveMesh(p, "value", thr, emb)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      val months = p.select(T).distinct().collect().map(_.getLong(0))
      for (m <- months; u <- units) {
        val (ex, ey) = emb.cells(u)
        val covering = mesh.filter { case (mm, lvl, nx, ny) =>
          mm == m && (ex >> (emb.power - lvl)) == nx && (ey >> (emb.power - lvl)) == ny
        }
        assert(covering.length == 1,
          s"unit $u month $m threshold $thr covered ${covering.length}x")
      }
    }
  }

  test("LSH-blocked near-dup pairs are a subset of the exact pairs") {
    val vecs = (0L until 40L).map { i =>
      (i, Array.tabulate(8)(d => (math.sin(i * 3.7 + d) * 10).toFloat))
    }.toDF("vec_id", "embedding")
    val exact = similarity.Similarity.cosineNearDupPairs(vecs, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = similarity.Similarity.lshNearDupPairs(vecs, 0.5, 0 until 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), s"LSH found non-pairs: ${lsh -- exact}")
    assert(lsh.nonEmpty)
  }

  test("minhash (b,r) calibration: candidate recall tracks the S-curve at r=2 and r=4") {
    // Controlled-Jaccard corpus: pair p's two docs (ids 2p, 2p+1) each
    // hold 100 shingles of which exactly k are shared, so
    // J = k / (200 - k) by construction. Shingle strings are
    // namespaced per pair, making pairs independent draws of the
    // banding experiment. For numHashes=12 banded into b = 12/r bands
    // of r rows, MinHash theory gives
    // P(candidate) = 1 - (1 - J^r)^b; with M pairs per level the
    // observed recall is Binomial(M, p)/M and must land within 3
    // sigma of p. bandRows=1 is covered by the oracle-checked
    // q_minhash_lsh; this pins the r=2 and r=4 calibration the r5
    // review flagged as untested.
    val numHashes = OracleExt.MinhashHashes // 12
    val M = 60
    val levels = Seq(89, 67, 33) // J ~= 0.80, 0.50, 0.20
    val rows = for {
      (k, lvl) <- levels.zipWithIndex
      p <- 0 until M
      docOffset = (lvl * M + p) * 2L
      (docId, shingle) <- {
        val ns = s"L${lvl}p$p"
        val shared = (0 until k).map(i => s"${ns}_s$i")
        val aOnly = (0 until 100 - k).map(i => s"${ns}_a$i")
        val bOnly = (0 until 100 - k).map(i => s"${ns}_b$i")
        (shared ++ aOnly).map((docOffset, _)) ++
          (shared ++ bOnly).map((docOffset + 1, _))
      }
    } yield (docId, shingle)
    val sh = rows.toDF("doc_id", "shingle")
    val sig = dedup.Dedup.minhash(sh, numHashes).cache()
    for (r <- Seq(2, 4)) {
      val cand = dedup.Dedup.lshCandidates(sig, numHashes, r)
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      for (((k, lvl)) <- levels.zipWithIndex) {
        val j = k.toDouble / (200 - k)
        val pTheory = 1.0 - math.pow(1.0 - math.pow(j, r), numHashes / r)
        val hits = (0 until M).count { p =>
          val a = (lvl * M + p) * 2L
          cand.contains((a, a + 1))
        }
        val recall = hits.toDouble / M
        val sigma = math.sqrt(pTheory * (1 - pTheory) / M)
        assert(math.abs(recall - pTheory) <= 3 * sigma + 0.02,
          s"r=$r J=$j: recall $recall vs theory $pTheory (3-sigma ${3 * sigma})")
      }
    }
    sig.unpersist()
  }

  test("scrubPii is idempotent; span removal yields a subsequence") {
    // redaction tokens contain no '@', '://', digits — so a second
    // scrub pass is the identity (no pattern can re-match its own
    // replacement)
    val gen = Gen.listOfN(6, Gen.oneOf(
      "plain words here", "a@b.co", "https://x.io/p?q=1", "10.0.0.1",
      "+1 (555) 123-4567", "mixed a@b.co and http://y.z", "42", "."))
    forAll(gen) { parts =>
      val docs = Seq((1L, parts.mkString(" "))).toDF("doc_id", "text")
      val once = text.TextOps.scrubPii(docs).head.getString(1)
      val twice = text.TextOps.scrubPii(
        Seq((1L, once)).toDF("doc_id", "text")).head.getString(1)
      assert(twice == once, s"not idempotent: '$once' -> '$twice'")
    }
    // span removal: the cleaned text is always a subsequence of the
    // normalised original, and n_removed accounts exactly for the gap
    val wordGen = Gen.listOfN(12, Gen.oneOf("a", "b", "c", "d", "e"))
    forAll(gen2(wordGen, wordGen), count = 5) { case (w1, w2) =>
      val docs = Seq((1L, w1.mkString(" ")), (2L, w2.mkString(" "))).toDF("doc_id", "text")
      val out = dedup.Dedup.removeRepeatedSpans(docs, n = 3, minDf = 2)
        .orderBy("doc_id").collect()
      Seq(w1, w2).zip(out).foreach { case (w, r) =>
        val cleaned = r.getString(1).split(" ").filter(_.nonEmpty).toSeq
        assert(isSubsequence(cleaned, w), s"$cleaned not subseq of $w")
        assert(r.getLong(2) == w.length - cleaned.length)
      }
    }
  }

  private def isSubsequence(sub: Seq[String], full: Seq[String]): Boolean = {
    var i = 0
    full.foreach { w => if (i < sub.length && sub(i) == w) i += 1 }
    i == sub.length
  }

  test("chunkDocuments coverage property: every token appears, order preserved") {
    val wordGen = Gen.chooseNum(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "dd")))
    forAll(gen3(wordGen, Gen.chooseNum(2, 8), Gen.chooseNum(0, 1)), count = 8) {
      case (ws0, maxTok, ov) =>
        // make tokens positionally unique so coverage/order are checkable
        val ws = ws0.zipWithIndex.map { case (w, i) => s"$w$i" }
        val docs = Seq((1L, ws.mkString(" "))).toDF("doc_id", "text")
        val chunks = graft.text.TextOps.chunkDocuments(docs, maxTok, ov)
          .orderBy("chunk_id").collect().map(_.getString(2))
        val step = maxTok - ov
        // dropping each chunk's overlap prefix reassembles the doc exactly
        val restored = chunks.zipWithIndex.flatMap { case (t, i) =>
          val toks = t.split(" ").toSeq
          if (i == 0) toks else toks.drop(ov)
        }
        assert(restored.toSeq == ws, s"maxTok=$maxTok ov=$ov: ${restored.toSeq} vs $ws")
        // every chunk except the last is full-size
        chunks.init.foreach(c => assert(c.split(" ").length == maxTok))
    }
  }

  test("derived packing buckets: bounded per-bucket mass, monotone, >= 1") {
    import text.Packing
    // arithmetic properties over random (total, unit, upb) draws
    val gen = for {
      total <- Gen.chooseNum(0L, 1L << 50)
      unit <- Gen.chooseNum(1L, 1L << 20)
      upb <- Gen.chooseNum(1, 4096)
    } yield (total, unit, upb)
    Gen.listOfN(200, gen).apply(Gen.Parameters.default, Seed(77L)).get
      .foreach { case (total, unit, upb) =>
        val b = Packing.deriveBuckets(total, unit, upb)
        assert(b >= 1 && b <= Packing.MaxDerivedBuckets)
        // ceil property: expected per-bucket token mass never exceeds
        // the unitsPerBucket × unitTokens target — unless the backstop
        // cap engaged (degenerate unit budgets), where mass is instead
        // bounded by total/cap
        if (total > 0 && b < Packing.MaxDerivedBuckets)
          assert(total.toDouble / b <= unit.toDouble * upb + 1e-6,
            s"total=$total unit=$unit upb=$upb b=$b")
        // monotone in corpus size: more tokens never fewer buckets
        assert(Packing.deriveBuckets(total * 2 max total, unit, upb) >= b)
      }
    // end-to-end on a corpus: the derived pack keeps actual per-bucket
    // mass near the target (hash uniformity; seeded fixture)
    val docs = (0L until 400L).map { i =>
      val words = 20 + (i * 37 % 160)
      (i, Seq.fill(words.toInt)("w" + (i % 13)).mkString(" "))
    }.toDF("doc_id", "text")
    val total = Packing.totalTokens(docs)
    val packed = Packing.packShardsAuto(docs, tokensPerShard = 500,
      shardsPerBucket = 8, salt = "auto0")
    val expectedB = Packing.deriveBuckets(total, 500, 8)
    val mass = packed.groupBy("bucket").agg(sum("n_tokens").as("m"))
      .collect().map(_.getLong(1))
    assert(mass.length <= expectedB)
    // each bucket's mass stays within ~2.5x of the even share — the
    // md5 band is uniform, and the derivation keeps shares ~constant
    // regardless of corpus size
    val even = total.toDouble / expectedB
    assert(mass.forall(_ <= even * 2.5),
      s"bucket mass ${mass.toSeq} vs even share $even")
  }

  test("quantize round-trip property: error <= scale/2, extremes hit ±127") {
    val vecGen = Gen.chooseNum(2, 16).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-100.0, 100.0)))
    forAll(vecGen, count = 10) { xs =>
      val emb = Seq((1L, xs.map(_.toFloat))).toDF("vec_id", "embedding")
      val row = similarity.Similarity.quantize(emb).head()
      val (s, q) = (row.getDouble(1), row.getSeq[Int](2))
      assert(q.forall(v => v >= -127 && v <= 127))
      xs.map(_.toFloat.toDouble).zip(q).foreach { case (x, qi) =>
        assert(math.abs(x - qi * s) <= s / 2 + 1e-9, s"x=$x q=$qi scale=$s")
      }
      val maxAbs = xs.map(x => math.abs(x.toFloat.toDouble)).max
      if (maxAbs > 0) assert(q.exists(v => math.abs(v) == 127))
    }
  }

  test("streaming as-of (batch mode) equals the batch as-of join on random event logs") {
    // random event logs: few users, colliding timestamps, purchase
    // density varied — the two formulations (buffer+replay+carry vs
    // union+window) must agree row-for-row including ties and nulls
    val eventGen: Gen[List[(Long, Long, Double, String)]] =
      Gen.chooseNum(5, 30).flatMap(n => Gen.listOfN(n,
        gen3(Gen.chooseNum(1L, 3L), Gen.chooseNum(0L, 9L),
          Gen.chooseNum(0.0, 9.0)).flatMap { case (u, t, v) =>
          Gen.oneOf("view", "purchase", "view").map(et => (u, t, v, et))
        }))
    forAll(eventGen, count = 8) { evs =>
      val rows = evs.zipWithIndex.map { case ((u, t, v, et), i) =>
        (new java.sql.Timestamp(86400000L + t * 1000L), u, i.toLong, v, et)
      }
      val df = rows.toDF("ts", "user_id", "event_id", "value", "event_type")
      val stream = graft.streaming.AsofStream.asofPurchases(df).toDF()
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          Option(r.getAs[java.lang.Double]("purchase_value")))).toSet
      val ev = df.select(col("user_id"), unix_micros(col("ts")).as("t"),
        col("event_id"), col("value"), col("event_type"))
      val right = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("t"))
        .agg(max(col("value")).as("purchase_value"))
      val batch = relational.AsofJoin.asofJoin(
          ev.select(col("user_id"), col("t"), col("event_id")),
          right, "user_id", "t", Seq("purchase_value"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          Option(r.getAs[java.lang.Double]("purchase_value")))).toSet
      assert(stream == batch, s"events: $rows")
    }
  }

  test("normalised kernels sum to 1; splag4d is linear in the input") {
    forAll(gen3(Gen.chooseNum(1, 3), Gen.chooseNum(1, 3), Gen.chooseNum(0.0, 3.0))) {
      case (inner, width, power) =>
      val k = Grid.kernelOffsets(inner, width, power, norm = true)
      assert(math.abs(k.map(_._3).sum - 1.0) < 1e-9)
    }
    // linearity: splag(a·x) = a·splag(x) on a fixed small grid
    val units = Seq(0L, 1L, 40L, 41L)
    def gp(scale: Double) = units.zipWithIndex
      .map { case (u, i) => (1L, u, scale * (i + 1)) }
      .toDF(T, U, "value")
      .withColumn("lon", Grid.unitLon(col(U)))
      .withColumn("lat", Grid.unitLat(col(U)))
    val base = KernelLag.splag4d(gp(1.0), "value", 1, 1, 1.0, norm = false)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    val scaled = KernelLag.splag4d(gp(3.0), "value", 1, 1, 1.0, norm = false)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    units.foreach(u => assert(math.abs(scaled(u) - 3.0 * base(u)) < 1e-9))
  }

  test("partitioning invariance: dsir weights, curriculum ranks, PQ codes") {
    // a distributed operator's RESULT must not depend on how input rows
    // happen to be split across tasks — re-partitioned inputs are the
    // cheapest proxy for "different cluster, different file layout"
    val docs = (0L until 120L).map { i =>
      val lang = if (i % 3 == 0) "en" else "de"
      (i, s"tok${i % 7} tok${i % 11} tok${i % 13} filler${i % 5}", lang)
    }.toDF("doc_id", "text", "lang")
    def dsirOf(parts: Int) = graft.sampling.Dsir
      .importanceWeights(docs.repartition(parts), col("lang") === "en", 64)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    assert(dsirOf(2) == dsirOf(9))

    def rankOf(parts: Int) = graft.ops.Ranking
      .globalRank(docs.repartition(parts),
        Seq(length(col("text")), col("doc_id")))
      .select("doc_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rankOf(2) == rankOf(9))

    val emb = (0 until 24).map { i =>
      val c = i % 3
      (i.toLong, Seq.tabulate(8)(d => (if (d / 3 == c) 10f else 0f) + i * 0.01f))
    }.toDF("vec_id", "embedding")
    def codesOf(parts: Int) = graft.similarity.Pq
      .buildPqIndex(emb.repartition(parts), m = 2, ksub = 3, iters = 2)
      .codes.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(codesOf(2) == codesOf(7))
  }

  test("Panel.fix9 (the scan-side Round expression) equals " +
      "CusumStream.fix9 (the state-side BigDecimal HALF_UP) on every " +
      "generated double incl. grid boundaries") {
    // the streaming twin's contract: a value fixed on arrival must land
    // on the IDENTICAL 1e-9 grid point as the batch plan's round() —
    // one disagreement and replay ≠ batch. Sample wide magnitudes plus
    // values engineered to sit ON and NEXT TO .5 grid boundaries.
    val near = (0L until 50L).flatMap { k =>
      val tie = (k * 1000 + 500).toDouble / 1e9
      Seq(tie, math.nextUp(tie), math.nextDown(tie), -tie)
    }
    forAll(Gen.listOfN(60, Gen.chooseNum(-1.0e6, 1.0e6)), count = 5) { vs =>
      val all = (vs ++ near).filter(v => math.abs(v) < 9.0e9)
      val viaPlan = all.toDF("v")
        .select(Panel.fix9(col("v")).as("f")).collect().map(_.getLong(0))
      val viaJvm = all.map(graft.streaming.CusumStream.fix9)
      assert(viaPlan.toSeq == viaJvm,
        all.zip(viaPlan.zip(viaJvm)).filter { case (_, (a, b)) => a != b }
          .take(5).toString)
    }
  }

  test("partitioning invariance: cusum, ewma, decompose") {
    // the r8 gate failure mode: an unordered window mean's last-ULP value
    // shifts with partition layout, and a running sum amplifies it by t
    // past the 1e-6 output rounding. Large-magnitude values + long series
    // maximise that amplification; the rounded outputs must be identical
    // across partitionings anyway.
    val panel = (0 until 8).flatMap { u =>
      (0 until 150).map { t =>
        (t.toLong, u.toLong,
          1.0e6 + math.sin(t * 0.7 + u) * 1.0e3 + t * 0.1234567)
      }
    }.toDF(T, U, "value")

    def cusumOf(parts: Int) = {
      val cs = TemporalOps.cusum(col("value"), 3.0)
      panel.repartition(parts)
        .select(col(T), col(U), round(cs.getField("cusum"), 6).as("c"),
          cs.getField("breach").as("b"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
    }
    assert(cusumOf(2) == cusumOf(13))

    def ewmaOf(parts: Int) = panel.repartition(parts)
      .select(col(T), col(U),
        round(TemporalOps.ewma(col("value"), alpha = 0.5, span = 6), 6)
          .as("e"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(ewmaOf(2) == ewmaOf(13))

    def decomposeOf(parts: Int) = {
      val d = TemporalOps.decompose(col("value"), period = 7, half = 2)
      panel.repartition(parts)
        .select(col(T), col(U), round(d.getField("trend"), 6).as("t"),
          round(d.getField("seasonal"), 6).as("s"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .toSet
    }
    assert(decomposeOf(2) == decomposeOf(13))
  }

  test("partitioning invariance: trendFit and centroidOutliers") {
    // same hazard class as cusum: unordered sufficient-statistic sums
    // feed t-amplifying (trend) or z-normalised (outlier) arithmetic;
    // the 1e-9 pre-rounding must make the rounded outputs layout-proof
    val panel = (0 until 6).flatMap { u =>
      (0 until 120).map { t =>
        (t.toLong, u.toLong,
          1.0e6 + t * 17.3456 + math.cos(t * 1.3 + u) * 997.0)
      }
    }.toDF(T, U, "value")
    def trendOf(parts: Int) = {
      val f = graft.ops.TemporalOps.trendFit(col("value"))
      panel.repartition(parts)
        .select(col(T), col(U), round(f.getField("fitted"), 6).as("f"),
          round(f.getField("detrended"), 6).as("d"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .toSet
    }
    assert(trendOf(2) == trendOf(13))

    val embeds = (0 until 60).map { i =>
      (i.toLong, Array.tabulate(16)(d =>
        (math.sin(i * 0.37 + d) * 1000.0).toFloat), i % 3)
    }.toDF("vec_id", "embedding", "label")
    def outliersOf(parts: Int) =
      graft.similarity.Similarity.centroidOutliers(embeds.repartition(parts))
        .collect()
        .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3), r.getInt(4)))
        .toSet
    assert(outliersOf(2) == outliersOf(13))
  }

  test("partitioning invariance: corr matrix, welch t, auc, pareto") {
    // the integer-sufficient-statistic discipline must make every
    // emitted float independent of partition layout by construction
    val df = (1 to 4000).map { i =>
      (i.toLong, 1.0e4 + i * 0.37 + math.sin(i * 2.1) * 997.13,
        math.cos(i * 1.7) * 1e3, i % 3 == 0)
    }.toDF("id", "x", "y", "label")
    def allOf(parts: Int): Seq[Set[Seq[Any]]] = {
      val d = df.repartition(parts)
      Seq(
        graft.relational.Stats.corrMatrix(d, Seq("x", "y"))
          .collect().map(_.toSeq).toSet,
        graft.relational.Stats.welchT(
          d.filter(col("id") % 2 === 0), d.filter(col("id") % 2 === 1), "x")
          .collect().map(_.toSeq).toSet,
        graft.ml.Eval.aucRoc(d, col("x"), col("label"))
          .collect().map(_.toSeq).toSet,
        graft.relational.Profile.paretoShare(d, "x", "id", buckets = 4)
          .collect().map(_.toSeq).toSet)
    }
    assert(allOf(2) == allOf(17))
  }

  test("partitioning invariance: the late-r9 statistics tail") {
    val panel = (for { u <- 1L to 40L; m <- 1L to 16L } yield
      (m, u, math.sin(u * 0.9 + m * 0.7) * 20.0 + (m % 5)))
      .toDF(Panel.TimeCol, Panel.UnitCol, "value")
    val ev = (for { u <- 1L to 30L; i <- 0 until (u % 7 + 2).toInt } yield
      (u * 100 + i, java.sql.Timestamp.valueOf(
        f"2024-01-${(i % 27) + 1}%02d 0${(u % 9)}%01d:00:00"), u,
        if (i % 3 == 0) "purchase" else "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val docsDf = (1L to 120L).map(i =>
      (i, s"tok${i % 17} tok${i % 5} tok${i % 3} body text number $i",
        if (i % 2 == 0) "en" else "de", s"src${i % 3}", 40L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    def allOf(parts: Int): Seq[Set[Seq[Any]]] = {
      val p = panel.repartition(parts)
      val e = ev.repartition(parts)
      val d = docsDf.repartition(parts)
      Seq(
        graft.ops.TemporalOps.mannKendall(p, "value")
          .collect().map(_.toSeq).toSet,
        graft.ops.TemporalOps.runsTest(p, "value")
          .collect().map(_.toSeq).toSet,
        graft.ops.TemporalOps.dominantPeriod(p, "value")
          .collect().map(_.toSeq).toSet,
        graft.ops.TemporalOps.seasonalStrength(p, "value", 4, 1)
          .collect().map(_.toSeq).toSet,
        graft.relational.Engagement.burstiness(e)
          .collect().map(_.toSeq).toSet,
        graft.relational.Survival.logRank(
            e.filter(col("user_id") % 2 === 0),
            e.filter(col("user_id") % 2 === 1), censorDays = 1)
          .collect().map(_.toSeq).toSet,
        graft.relational.Profile.diversityIndex(d, "source")
          .collect().map(_.toSeq).toSet,
        graft.text.TextOps.corpusReport(d)
          .collect().map(_.toSeq).toSet,
        graft.relational.Stats.exactQuantiles(d, "n_chars",
            Seq(0.25, 0.5, 0.75))
          .collect().map(_.toSeq).toSet)
    }
    assert(allOf(2) == allOf(17))
  }

  test("partitioning invariance: the r10 statistics tail") {
    val tbl = (1L to 240L).map(i =>
      (i, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c",
        (i * 7 % 13).toDouble + (i % 4) * 0.25))
      .toDF("id", "grp", "v")
    val docsDf = (1L to 90L).map(i =>
      (i, s"alpha tok${i % 11} tok${i % 4} beta gamma word $i",
        s"src${i % 4}")).toDF("doc_id", "text", "source")
    val edges = (1L to 60L).flatMap(i =>
      Seq((i, i % 20 + 100), (i % 7 + 1, i % 11 + 1)))
      .filter(p => p._1 != p._2).toDF("id_a", "id_b")
    def allOf(parts: Int): Seq[Set[Seq[Any]]] = {
      val t = tbl.repartition(parts)
      val d = docsDf.repartition(parts)
      val e = edges.repartition(parts)
      Seq(
        graft.relational.Stats.mannWhitney(t.filter(col("id") % 2 === 0),
            t.filter(col("id") % 2 === 1), "v")
          .collect().map(_.toSeq).toSet,
        graft.relational.Stats.brownForsythe(t, "grp", "v", 2.996)
          .collect().map(_.toSeq).toSet,
        graft.relational.Stats.moodMedian(t, "grp", "v", 5.991)
          .collect().map(_.toSeq).toSet,
        graft.sampling.Sampling.rakeUniform(t, "grp", "v", iters = 3)
          .collect().map(_.toSeq).toSet,
        graft.ml.Eval.calibration(t,
            col("v") / 13.0, col("id") % 2 === 0)
          .collect().map(_.toSeq).toSet,
        graft.text.TextOps.vocabDrift(d)
          .collect().map(_.toSeq).toSet,
        graft.graphs.KCore.kcore(e, k = 2, rounds = 3)
          .collect().map(_.toSeq).toSet,
        graft.graphs.GraphStats.assortativity(e)
          .collect().map(_.toSeq).toSet)
    }
    assert(allOf(2) == allOf(17))
  }

  test("partitioning invariance: spearman, anova, spatial stats, NDCG") {
    val panel = (for { u <- 1L to 60L; m <- 1L to 12L } yield
      (m, u, math.sin(u * 0.7 + m * 1.3) * 50.0 + (u % 7)))
      .toDF(Panel.TimeCol, Panel.UnitCol, "value")
      .withColumn("lon", graft.spatial.Grid.unitLon(col(Panel.UnitCol)))
      .withColumn("lat", graft.spatial.Grid.unitLat(col(Panel.UnitCol)))
    val li = (1 to 3000).map(i =>
      (i % 47, (i * 31) % 11, 1e3 + (i % 13) * 7.77, s"g${i % 3}"))
      .toDF("qty", "disc", "price", "grp")
    val emb = (1L to 60L).map(i =>
      (i, Array(math.cos(i * 0.5).toFloat, math.sin(i * 0.3).toFloat,
        (i % 5).toFloat), (i % 3).toInt))
      .toDF("vec_id", "embedding", "label")
    def allOf(parts: Int): Seq[Set[Seq[Any]]] = {
      val p = panel.repartition(parts)
      val l = li.repartition(parts)
      val e = emb.repartition(parts)
      val q = e.filter(col("vec_id") <= 5)
      Seq(
        graft.relational.Stats.spearman(l, "qty", "disc")
          .collect().map(_.toSeq).toSet,
        graft.relational.Stats.anovaF(l, "grp", "price", critical = 3.0)
          .collect().map(_.toSeq).toSet,
        graft.spatial.SpatialStats.moranI(p, "value")
          .collect().map(_.toSeq).toSet,
        graft.spatial.SpatialStats.gearyC(p, "value")
          .collect().map(_.toSeq).toSet,
        graft.spatial.SpatialStats.getisOrdGi(p, "value")
          .collect().map(_.toSeq).toSet,
        graft.spatial.SpatialStats.localMoran(p, "value")
          .collect().map(_.toSeq).toSet,
        graft.similarity.Similarity.retrievalEval(e, q,
            graft.similarity.Similarity.quantizedTopK(e, q, 5), 5)
          .collect().map(_.toSeq).toSet,
        graft.similarity.Similarity.knnF1(e, q, 5)
          .collect().map(_.toSeq).toSet)
    }
    assert(allOf(2) == allOf(17))
  }
}
