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

  /** Streaming benchmark decontamination: drop arriving documents that
    * share any word-`n`-gram with the (static, bounded) eval corpus.
    * The eval shingle set folds into a Bloom filter carried INSIDE the
    * filter expression (`functions.BloomContains`) and the document's
    * shingle array is built row-locally — the whole gate is a
    * STATELESS scan-side filter: no stream-static join, no state
    * store, works in any output mode.
    *
    * Bloom false positives (rate `fpp`) drop clean documents — the
    * conservative failure direction for decontamination, but still a
    * loss, so the default is 1e-6: a doc of s shingles survives with
    * probability ≈ 1 − s·fpp, and at 1e-6 even thousand-shingle docs
    * lose < 0.1% — while a million-shingle eval set still blooms to a
    * few MB. The batch [[graft.text.Contamination.decontaminate]]
    * remains the exact audit path.
    */
  def decontaminateStream(docs: DataFrame, eval: DataFrame, n: Int,
                          fpp: Double = 1e-6,
                          textCol: String = "text"): DataFrame = {
    val evalSh = graft.dedup.Dedup
      .shingles(eval, n, idCol = "doc_id", textCol = textCol)
      .select("shingle").distinct()
    val bloom = evalSh.stat.bloomFilter("shingle",
      math.max(evalSh.count(), 1L), fpp)
    val words = split(TextOps.normalize(col(textCol)), " ")
    val shArr = array_distinct(transform(
      sequence(lit(0), greatest(size(words) - n, lit(0))),
      i => array_join(slice(words, i + 1, lit(n)), " ")))
    docs.filter(!exists(shArr,
      s => graft.functions.BloomContains.contains(s, bloom)))
  }

  /** Ingest observability: per event-time window and predicted
    * language, the document count, token mass, and mean quality score
    * of arriving documents — the monitoring feed a streaming curation
    * pipeline alarms on (a quality-mean collapse or a language-mix
    * shift in a window means an upstream crawler broke). Watermarked
    * windowed aggregation: each (window, lang) row emits exactly once
    * when the watermark passes the window end, state is dropped after
    * — bounded by horizon × languages, independent of stream length.
    * All measures are the batch operators' own Column expressions, so
    * the stream monitor and batch corpusStats cannot drift apart.
    */
  def qualityWindowed(docs: DataFrame, window: String = "1 hour",
                      delay: String = "1 hour",
                      textCol: String = "text", tsCol: String = "ts"): DataFrame =
    docs
      .withColumn("__lang", TextOps.langId(col(textCol)))
      .withColumn("__q", TextOps.qualityScore(col(textCol)))
      .withColumn("__nt", TextOps.tokenCount(col(textCol)).cast("long"))
      .withWatermark(tsCol, delay)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window).as("w"),
        col("__lang").as("lang_pred"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__nt")).as("total_tokens"),
        avg(col("__q")).as("avg_quality"))
      .select(col("w.start").as("window_start"), col("lang_pred"),
        col("n_docs"), col("total_tokens"), col("avg_quality"))

  /** One document travelling the near-dedup stages: `dropped` is the
    * sticky any-band verdict. (Public: Catalyst's generated encoder
    * code must reach the accessors — a private case class fails Janino
    * compilation.)
    */
  final case class NdRow(ts: java.sql.Timestamp, doc_id: Long,
                         text: String, sig: String, dropped: Boolean)

  /** Streaming NEAR-duplicate dedup (r6 verdict item 8): documents
    * within simhash64 hamming distance `maxDist` of an earlier
    * arrival are dropped, with watermark-bounded state — the
    * streaming twin of [[graft.dedup.Dedup.simhash64Pairs]] +
    * keep-the-first cluster resolution.
    *
    * Shape: the signature is computed ROW-LOCALLY
    * ([[graft.dedup.Dedup.simhash64Expr]] — no per-doc aggregation on
    * the stream), then the doc passes through FOUR chained
    * `flatMapGroupsWithState` stages, one per 16-bit signature band.
    * Stage k groups by band k's value, so state shards across 2¹⁶
    * buckets per band and a group holds only that bucket's
    * signatures; by pigeonhole (`maxDist` ≤ 3 over 4 bands) every
    * qualifying pair agrees exactly on some band and is examined by
    * that stage — the banding loses nothing, exactly as in the batch
    * operator. Every stage records EVERY document's signature
    * (dropped ones included) and only marks the sticky `dropped`
    * flag; the final stateless filter emits survivors — so a doc
    * matching an already-dropped earlier doc is still dropped
    * (cluster-transitive through the prefix), matching the batch
    * connected-components convention for every cluster whose edges
    * point backwards in arrival order. The one inherent divergence
    * from batch CC is retroactivity: a LATE doc bridging two earlier
    * distant docs cannot un-emit them (online-dedup prefix
    * semantics).
    *
    * State per (stage, bucket): the signatures inside the watermark
    * horizon, pruned on every invocation and evicted wholesale by
    * event-time timeout — bounded by ingest rate × `delayMs`,
    * independent of stream length.
    *
    * @return survivors as (tsCol, doc_id, textCol, simhash64)
    */
  def nearDedupDocsStream(docs: DataFrame, delayMs: Long = 86400000L,
                          maxDist: Int = 3, textCol: String = "text",
                          tsCol: String = "ts"): DataFrame = {
    require(maxDist <= 3, "banding is exact only for maxDist <= 3")
    val spark = docs.sparkSession
    import spark.implicits._
    // Spark's static chained-stateful-operator check assumes a
    // flatMapGroupsWithState stage may emit rows arbitrarily older
    // than the watermark (it cannot see the operator's contract).
    // These stages forward every row in the micro-batch it arrives —
    // zero added event-time latency — so the flagged late-row hazard
    // cannot occur; the config is Spark's sanctioned escape hatch for
    // exactly this understood case.
    spark.conf.set(
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
    val base = docs
      .withColumn("__sig", graft.dedup.Dedup.simhash64Expr(col(textCol)))
      .withWatermark(tsCol, s"$delayMs milliseconds")
      .select(col(tsCol).cast("timestamp").as("ts"),
        col("doc_id").cast("long").as("doc_id"),
        col(textCol).cast("string").as("text"),
        col("__sig").as("sig"), lit(false).as("dropped"))
      .as[NdRow]
    val staged = (0 until 4).foldLeft(base)((ds, b) =>
      nearDedupStage(ds, b, maxDist, delayMs))
    staged.filter(!_.dropped)
      .toDF()
      .select(col("ts").as(tsCol), col("doc_id"),
        col("text").as(textCol), col("sig").as("simhash64"))
  }

  private def hammingDist(a: String, b: String): Int = {
    var i = 0; var d = 0
    while (i < a.length) { if (a.charAt(i) != b.charAt(i)) d += 1; i += 1 }
    d
  }

  private def nearDedupStage(ds: org.apache.spark.sql.Dataset[NdRow],
                             band: Int, maxDist: Int,
                             delayMs: Long): org.apache.spark.sql.Dataset[NdRow] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = ds.sparkSession
    import spark.implicits._
    // Signature entries are pruned on every group access against the
    // query's GLOBAL event-time watermark (getCurrentWatermarkMs — the
    // state operator receives it even though the watermark COLUMN
    // metadata does not survive the previous stage, which rules out
    // EventTimeTimeout here: it statically requires the column, and
    // re-declaring a watermark mid-chain is disallowed). Timeouts are
    // deliberately NOT used: ProcessingTimeTimeout makes the operator
    // request a micro-batch on EVERY trigger (measured: a continuous
    // no-data batch loop), so a bucket that stops receiving traffic
    // simply keeps its last (already pruned) list until next touched —
    // state is bounded by one watermark horizon of signatures per
    // active bucket, the idle remainder by 4·2¹⁶ buckets × their last
    // horizon's content.
    ds.groupByKey(r => r.sig.substring(16 * band, 16 * band + 16))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[NdRow],
         st: GroupState[List[(String, Long)]]) => {
          val wm = try st.getCurrentWatermarkMs()
          catch { case _: UnsupportedOperationException => Long.MinValue }
          var seen = st.getOption.getOrElse(Nil)
            .filter(_._2 + delayMs >= wm)
          // deterministic first-wins inside a micro-batch
          val out = rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id)).map { r =>
            val dup = seen.exists(s => hammingDist(s._1, r.sig) <= maxDist)
            seen = (r.sig, r.ts.getTime) :: seen
            r.copy(dropped = r.dropped || dup)
          }
          if (seen.isEmpty) st.remove() else st.update(seen)
          out.iterator
        })
  }
}
