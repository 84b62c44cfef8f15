package graft

import graft.text.Bpe
import org.apache.spark.sql.functions._

/** BPE merge learning against the worked example of the public
  * algorithm (Sennrich, Haddow & Birch 2016, §3.2): corpus
  * low×5 lower×2 newest×6 widest×3.
  */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = {
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    // spread over several docs so wordFreqs actually aggregates
    words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
  }

  test("trainMerges reproduces the paper's first merges deterministically") {
    val merges = Bpe.trainMerges(corpus, nMerges = 4)
    // pair counts round 1: es=9, st=9 (tie -> lexicographic: e<s),
    // then est=9, then lo=7/ow=7 tie -> lo, then low=7
    assert(merges.map(m => (m._2, m._3)) ==
      Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    assert(merges.map(_._5) == Seq(9L, 9L, 7L, 7L))
    assert(merges.map(_._1) == Seq(1, 2, 3, 4))
  }

  test("trainMerges stops when no pairs remain") {
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    // "ab" exhausts after 1 merge (single symbol left)
    val merges = Bpe.trainMerges(tiny, nMerges = 10)
    assert(merges.map(m => (m._2, m._3)) == Seq(("a", "b")))
  }

  test("mergePair folds left-to-right without overlap") {
    val df = Seq("aaa", "abab", "aaab").toDF("w")
      .select(col("w"), Bpe.mergePair(split(col("w"), ""), "a", "a").as("m"))
    val got = df.collect().map(r => r.getString(0) ->
      r.getSeq[String](1).mkString("|")).toMap
    assert(got("aaa") == "aa|a")
    assert(got("abab") == "a|b|a|b")
    assert(got("aaab") == "aa|a|b")
  }

  test("applyMerges segments by rule order and round-trips") {
    val merges = Bpe.trainMerges(corpus, nMerges = 4)
      .map(m => (m._2, m._3))
    val seg = Seq("lowest", "slower", "low")
      .toDF("w")
      .select(col("w"), Bpe.applyMerges(col("w"), merges).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    // es then est then lo then low, applied in order
    assert(seg("lowest") == Seq("low", "est"))
    assert(seg("slower") == Seq("s", "low", "e", "r"))
    seg.foreach { case (w, s) => assert(s.mkString == w) }
  }
}
