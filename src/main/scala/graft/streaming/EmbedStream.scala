package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming embedding near-duplicate dedup — the stream twin of
  * [[graft.similarity.Similarity.lshNearDupPairs]] + keep-the-first
  * resolution: vectors whose cosine to an EARLIER arrival is ≥
  * `threshold` are dropped as they arrive.
  *
  * Shape mirrors the batch operator exactly: candidates are blocked on
  * the sign-LSH bucket (a pair must agree on every projected
  * coordinate sign — vectors with cosine near 1 almost surely do),
  * then verified by exact cosine against the bucket's retained
  * members. The stream groups by bucket, so state shards across 2^nBits
  * buckets and a group holds only its bucket's vectors inside the
  * watermark horizon — ingest rate × delay, independent of stream
  * length. Recall < 1 by design (sign-boundary pairs are missed), the
  * same trade as the batch blocking.
  *
  * Deterministic first-wins inside a micro-batch (ts, then vec_id);
  * across batches, arrival order governs — the online prefix rule
  * every streaming dedup here shares.
  */
object EmbedStream {

  /** One vector travelling the dedup stage. Public: the generated
    * encoder must reach the accessors.
    */
  final case class EvRow(ts: java.sql.Timestamp, vec_id: Long,
                         vec: Array[Double], bucket: String)

  def nearDedupStream(vectors: DataFrame, threshold: Double,
                      dims: Seq[Int] = 0 until 8,
                      delayMs: Long = 86400000L,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding",
                      tsCol: String = "ts"): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val base = vectors
      .select(col(tsCol).cast("timestamp").as("ts"),
        col(idCol).cast("long").as("vec_id"),
        col(vecCol).cast("array<double>").as("vec"),
        graft.similarity.Similarity
          .signBucket(col(vecCol).cast("array<double>"), dims).as("bucket"))
      .withWatermark("ts", s"$delayMs milliseconds")
      .as[EvRow]
    base.groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[EvRow],
         st: GroupState[List[(Array[Double], Long)]]) => {
          val wm = try st.getCurrentWatermarkMs()
          catch { case _: UnsupportedOperationException => Long.MinValue }
          var seen = st.getOption.getOrElse(Nil)
            .filter(_._2 + delayMs >= wm)
          def cos(a: Array[Double], b: Array[Double]): Double = {
            var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
            while (i < a.length) {
              d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
            }
            val den = math.sqrt(na) * math.sqrt(nb)
            if (den == 0.0) 0.0 else d / den
          }
          val out = rows.toSeq.sortBy(r => (r.ts.getTime, r.vec_id)).flatMap { r =>
            val dup = seen.exists(s => cos(s._1, r.vec) >= threshold)
            seen = (r.vec, r.ts.getTime) :: seen
            if (dup) None else Some(r)
          }
          if (seen.isEmpty) st.remove() else st.update(seen)
          out.iterator
        })
      .toDF()
      .select(col("ts").as(tsCol), col("vec_id").as(idCol),
        col("vec").as(vecCol), col("bucket"))
  }

  /** Streaming index ingestion: append every micro-batch of vectors to
    * an ON-DISK IVF index written by
    * [[graft.similarity.Similarity.writeIvfIndex]] — each batch is
    * assigned against the FIXED trained quantizer
    * ([[graft.similarity.Similarity.appendIvfIndex]]) and lands as new
    * files inside the touched list= partition directories only. The
    * steady-state ANN serving loop: train once on a bootstrap corpus,
    * let the stream keep the index current, `ivfSearch` reads pick up
    * each appended batch on their next planning.
    *
    * foreachBatch is the right altitude: assignment is a stateless
    * per-batch scan (no cross-batch state to manage). A plain parquet
    * append is only at-least-once under replay, so each epoch commits
    * a `epochs/<batchId>` marker after its append and a replayed epoch
    * whose marker exists is skipped — replays of fully-committed
    * epochs (the failure mode foreachBatch actually produces: crash
    * between sink write and checkpoint commit) are idempotent. The one
    * residual window is a crash BETWEEN the data commit and the marker
    * write; if serving must be exact under that too, dedup the read
    * path (`readIvfIndex(...).assigned.dropDuplicates("neighbor_id")`).
    * Start the returned writer with `.start()`.
    */
  def indexIngest(vectors: DataFrame, indexPath: String,
                  idCol: String = "vec_id", vecCol: String = "embedding")
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    vectors.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val marker =
          new org.apache.hadoop.fs.Path(s"$indexPath/epochs/$batchId")
        val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(marker) && !batch.isEmpty) {
          graft.similarity.Similarity.appendIvfIndex(
            spark, indexPath, batch, idCol, vecCol)
          fs.create(marker, true).close()
        }
      }
}
