package graft.text

import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Inverted character-n-gram index over a documents table — the
  * retrieval-side counterpart of the dedup shingles: per shingle, its
  * document frequency and a bounded, sorted posting list.
  *
  * Scale shape: one explode (distinct shingles per doc, map-side) and
  * one hash aggregation keyed by shingle — the same single-shuffle
  * profile as exact dedup. Posting lists are built by a BOUNDED min-k
  * aggregator (the `SpacetimeDist.TopK` pattern): a stop-gram's
  * postings would otherwise grow an O(corpus) `collect_list` buffer in
  * one aggregation cell — the classic skew cell; here partial AND
  * merged buffers never exceed `maxPostings` ids. The full document
  * frequency survives in `df_count` regardless of the cap, and
  * postings are emitted as a comma-joined string (smallest ids first,
  * deterministic) so downstream engines need no array support.
  */
object Index {

  /** Bounded smallest-k set of longs through partial/merge aggregation:
    * both the reduce and merge sides cap at k, so no buffer anywhere in
    * the plan exceeds k elements however hot the key.
    */
  class MinK(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    override def zero: Seq[Long] = Seq.empty
    override def reduce(b: Seq[Long], a: Long): Seq[Long] =
      if (b.length >= k && a >= b.last) b
      else ((b :+ a).sorted.take(k))
    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      (a ++ b).sorted.take(k)
    override def finish(r: Seq[Long]): Seq[Long] = r
    override def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  def invertedIndex(docs: DataFrame, n: Int, maxPostings: Int,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    require(n > 0 && maxPostings > 0, "n and maxPostings must be positive")
    val mink = udaf(new MinK(maxPostings))
    Dedup.charGrams(docs, n, idCol, textCol)
      .groupBy(col("shingle"))
      .agg(count(lit(1)).cast("long").as("df_count"),
        array_join(mink(col(idCol)), ",").as("postings"))
  }
}
