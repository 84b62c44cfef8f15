package graft

import graft.text.Classifier
import org.apache.spark.sql.functions._

/** Specs for the trained Naive Bayes corpus-quality classifier. */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "good clean prose with the words", true),
    (2L, "good clean text and more words", true),
    (3L, "spam junk noise garbage tokens", false),
    (4L, "junk spam garbage noise here", false),
    (5L, "good clean words here", true),
    (6L, "noise garbage spam everywhere", false)
  ).toDF("doc_id", "text", "label")

  test("nbScore separates a vocabulary-separable corpus") {
    val out = Classifier.nbScore(corpus, col("label"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getInt(2))).toMap
    // positive-vocabulary docs score > 0, negative < 0
    Seq(1L, 2L, 5L).foreach { id =>
      assert(out(id)._1 > 0.0 && out(id)._2 == 1, s"doc $id: ${out(id)}")
    }
    Seq(3L, 4L, 6L).foreach { id =>
      assert(out(id)._1 < 0.0 && out(id)._2 == 0, s"doc $id: ${out(id)}")
    }
  }

  test("nbScore matches the hand-computed log-odds on a two-doc corpus") {
    val tiny = Seq((1L, "aa aa", true), (2L, "bb bb", false))
      .toDF("doc_id", "text", "label")
    val out = Classifier.nbScore(tiny, col("label"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // vocab {aa, bb}, tp = tn = 2, v = 2; for 'aa': cp=2, cn=0
    // lo(aa) = ln(3/4) − ln(1/4); prior = ln(2/2) = 0
    val loAa = math.log(3.0 / 4.0) - math.log(1.0 / 4.0)
    val micro = math.round(loAa * 1e6)
    val exp1 = BigDecimal(2 * micro / 1e6)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out(1L) - exp1) < 1e-9, s"got ${out(1L)}, want $exp1")
    assert(math.abs(out(2L) + exp1) < 1e-9, "symmetric corpus → mirrored score")
  }

  test("distinctiveTerms surfaces each group's marker token at rank 1") {
    val docs = Seq(
      (1L, "alpha alpha alpha shared words here", "s1"),
      (2L, "alpha alpha shared words again", "s1"),
      (3L, "omega omega omega shared words here", "s2"),
      (4L, "omega omega shared words again", "s2")
    ).toDF("doc_id", "text", "source")
    val out = graft.text.Classifier.distinctiveTerms(docs, "source", k = 3)
      .filter(col("rank") === 1)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("s1") == "alpha", s"s1 marker: $out")
    assert(out("s2") == "omega", s"s2 marker: $out")
  }

  test("nbScore is invariant to input partitioning (integer-sum determinism)") {
    val base = Classifier.nbScore(corpus, col("label"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    val shuffled = Classifier.nbScore(corpus.repartition(7), col("label"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(base == shuffled)
  }
}
