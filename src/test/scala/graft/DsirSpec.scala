package graft

import org.apache.spark.sql.functions._
import graft.sampling.Dsir

/** DSIR importance resampling: weight direction, determinism, and the
  * Gumbel-top-k selection contract.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // two vocabularies with zero overlap: target-ish docs speak "alpha
  // beta", background docs speak "zulu yankee"
  private def corpus = Seq(
    (0L, "alpha beta alpha beta alpha", "en"),
    (1L, "beta alpha beta alpha beta", "en"),
    (2L, "zulu yankee zulu yankee zulu", "de"),
    (3L, "yankee zulu yankee zulu yankee", "de"),
    (4L, "alpha beta alpha zulu beta", "de") // de doc that LOOKS en
  ).toDF("doc_id", "text", "lang")

  test("weights tilt toward the target distribution") {
    val w = Dsir.importanceWeights(corpus, col("lang") === "en", buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // docs made of target-vocabulary tokens outweigh background docs
    assert(w(0L) > w(2L) && w(1L) > w(3L))
    // the en-looking de doc sits between the pure groups: its tokens
    // are mostly target-typed, so it scores above the pure-background
    // docs — exactly the "select what looks like the target" behavior
    assert(w(4L) > w(2L))
    assert(w(4L) < w(0L))
  }

  test("weights are deterministic and cover every document") {
    val a = Dsir.importanceWeights(corpus, col("lang") === "en", buckets = 64)
      .orderBy("doc_id").collect().toSeq
    val b = Dsir.importanceWeights(corpus, col("lang") === "en", buckets = 64)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    assert(a.map(_.getLong(0)) == Seq(0L, 1L, 2L, 3L, 4L))
    assert(a.forall(_.getLong(1) == 5L)) // n_tokens
  }

  test("resample returns exactly k ranked rows, ranks 1..k") {
    val s = Dsir.resample(corpus, col("lang") === "en", k = 3, buckets = 64)
      .collect()
    assert(s.length == 3)
    assert(s.map(_.getAs[Int]("rank")).sorted.toSeq == Seq(1, 2, 3))
    // scores strictly follow the declared ordering
    val byRank = s.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("gumbel_score"))
    assert(byRank.zip(byRank.tail).forall { case (x, y) => x >= y })
  }

  test("temperature → 0 degenerates to hard top-k by weight") {
    val hard = Dsir.resample(corpus, col("lang") === "en", k = 2,
      buckets = 64, temperature = 1e-9)
      .collect().map(_.getLong(0)).toSet
    // the two pure-target-vocab docs dominate at tiny temperature
    assert(hard == Set(0L, 1L))
  }
}
