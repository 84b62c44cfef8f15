package graft.streaming

import graft.text.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming corpus ingest — the stream twins of the batch dedup/quality
  * operators, for pipelines that curate training data as it arrives
  * instead of in nightly batch sweeps.
  */
object CorpusStream {

  /** Exact content dedup on a document stream: the streaming twin of
    * [[graft.dedup.Dedup.exact]]. Each document is fingerprinted
    * (md5 of the normalised text) and re-arrivals of an already-seen
    * fingerprint are dropped while the watermark can still see the
    * original — at-least-once delivery and crawler re-fetches become
    * effectively-once ingest.
    *
    * State is one fingerprint per distinct document inside the
    * watermark horizon, evicted as the watermark advances — bounded by
    * ingest rate × `delay`, independent of total stream length. The
    * first arrival wins (same canonical-representative convention as
    * the batch operator's min-id rule under monotone ingest ids).
    */
  def dedupDocsStream(docs: DataFrame, delay: String = "1 day",
                      textCol: String = "text", tsCol: String = "ts"): DataFrame =
    docs.withColumn("fingerprint", TextOps.fingerprint(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Streaming quality gate: stateless Column-expression filters
    * (quality score ≥ `minQuality`, predicted language) compose onto a
    * stream unchanged — chain BEFORE [[dedupDocsStream]] so the dedup
    * state only holds documents worth keeping.
    */
  def qualityGate(docs: DataFrame, minQuality: Double, lang: String,
                  textCol: String = "text"): DataFrame =
    docs.filter(TextOps.qualityScore(col(textCol)) >= minQuality &&
      TextOps.langId(col(textCol)) === lang)
}
