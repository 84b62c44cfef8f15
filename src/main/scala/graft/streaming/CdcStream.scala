package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming CDC ingestion — the continuous twin of
  * [[graft.relational.Scd.cdcApply]]: change events (I/U/D with a
  * monotone sequence) stream into an append-only log store per epoch,
  * and serving resolves the CURRENT state merge-on-read by running the
  * SAME max_by-per-key reduction over the accumulated log. Because the
  * resolution is per-key over the full log, the served state is
  * EXACTLY the batch `cdcApply` of the concatenated epochs — epoch
  * boundaries, replays of a committed epoch (idempotent markers, the
  * DauStream discipline), and arrival order cannot change it.
  *
  * Scale shape: ingest is a blind append (no read-modify-write, no
  * shuffle); the cost moves to serve — one key-partitioned max_by
  * aggregation over log rows. A deployment bounds log growth by
  * periodically compacting resolved state back as a base epoch
  * ([[graft.text.Packing.compactPartitions]] is the file-level tool);
  * the merge-on-read semantics are unchanged because resolution is
  * associative per key.
  */
object CdcStream {

  /** Idempotently append one epoch of CDC events to the log store. */
  def ingestEpoch(log: DataFrame, storePath: String, epoch: Long): Unit = {
    val spark = log.sparkSession
    val marker = new org.apache.hadoop.fs.Path(s"$storePath/epochs/$epoch")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker) && !log.isEmpty) {
      log.write.mode("append").parquet(s"$storePath/log")
      fs.create(marker, true).close()
    }
  }

  /** The streaming writer: start with `.start()` (+ checkpoint). */
  def ingest(log: DataFrame, storePath: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    log.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestEpoch(batch, storePath, batchId)
      }

  /** Resolve the current state from the accumulated log, robust to a
    * CONCURRENT [[compact]]: the two-rename swap has a window where
    * `log/` does not exist (staged aside, replacement not yet renamed
    * in), and a reader that listed files just before the swap can hit
    * deleted parts mid-scan. `serve` therefore materializes the
    * resolved state EAGERLY (localCheckpoint) inside a bounded retry
    * loop — a missing-path/missing-file race surfaces INSIDE the loop
    * (never as a lazy frame that blows up in the caller's action) and
    * the next attempt reads the post-swap log. Any attempt that
    * completes returns the SAME state by the compact read-equivalence
    * contract (resolution is associative per key), and the returned
    * frame is decoupled from the log files: a compaction AFTER serve
    * returns cannot invalidate it.
    */
  def serve(spark: SparkSession, storePath: String, keyCol: String,
            seqCol: String, opCol: String,
            valueCols: Seq[String]): DataFrame = {
    val logPath = s"$storePath/log"
    val root = new org.apache.hadoop.fs.Path(storePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Retryable-miss taxonomy (r13, ADVICE carve-outs both ways):
    //   - a missing path/file ALWAYS enters the retry loop — including
    //     a missing store ROOT, which legitimately races the very
    //     FIRST ingest (the r12 fail-fast regressed that); a store
    //     that truly was never ingested fails AFTER the bounded
    //     retries with the informative error, ~1 s later than the old
    //     fail-fast but never spuriously;
    //   - FAILED_READ_FILE is only retryable when it also carries an
    //     observable missing-file signal: a swap artifact on disk
    //     (`log.compact-bak` staged aside / `log.compact-tmp` not yet
    //     renamed in), the log dir itself gone (the two-rename gap),
    //     or a part file named in the message that no longer exists
    //     (stale pre-swap listing read after the swap completed).
    //     A genuinely CORRUPT file — log present, no swap in flight,
    //     every named part still on disk — surfaces immediately
    //     instead of burning 40 blind retries.
    def swapObservable: Boolean =
      fs.exists(new org.apache.hadoop.fs.Path(logPath + ".compact-bak")) ||
        fs.exists(new org.apache.hadoop.fs.Path(logPath + ".compact-tmp")) ||
        !fs.exists(new org.apache.hadoop.fs.Path(logPath))
    def vanishedPart(msg: String): Boolean =
      (java.util.regex.Pattern.quote(logPath) + "/[^\\s'\"\\)\\]]+").r
        .findAllIn(msg)
        .exists(p => !fs.exists(new org.apache.hadoop.fs.Path(p)))
    def missingFile(e: Throwable): Boolean =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10).exists {
        t =>
          val msg = String.valueOf(t.getMessage)
          t.isInstanceOf[java.io.FileNotFoundException] ||
            msg.contains("PATH_NOT_FOUND") ||
            msg.contains("does not exist") ||
            // mid-FIRST-write window (found by the racing-first-ingest
            // spec): the log dir exists with only _temporary content
            // until the write commits, and schema inference over zero
            // committed parts throws UNABLE_TO_INFER_SCHEMA — the next
            // attempt sees the committed files. A permanently empty
            // log burns the bounded retries (~1 s) before the same
            // error surfaces, which is the retry loop's normal price.
            msg.contains("UNABLE_TO_INFER_SCHEMA") ||
            (msg.contains("FAILED_READ_FILE") &&
              (swapObservable || vanishedPart(msg)))
      }
    val maxAttempts = 40
    var attempt = 0
    var out: DataFrame = null
    while (out == null) {
      try out = graft.relational.Scd.cdcApply(
        spark.read.parquet(logPath), keyCol, seqCol, opCol, valueCols)
        .localCheckpoint()
      catch {
        case e: Throwable if missingFile(e) && attempt < maxAttempts =>
          attempt += 1
          Thread.sleep(25) // the swap gap is two renames — microseconds
        case e: Throwable if missingFile(e) && !fs.exists(root) =>
          throw new IllegalArgumentException(
            s"CDC store $storePath does not exist — nothing was ever " +
              s"ingested ($attempt bounded retries bridge only a " +
              s"concurrent compaction swap or a racing first ingest)", e)
      }
    }
    out
  }

  /** Compact the append-only log: rewrite the accumulated epochs as
    * ONE resolved base (the served state re-encoded as `I` rows that
    * keep each key's winning sequence number) via the two-rename
    * swap discipline of [[graft.text.Packing.compactPartitions]] —
    * write the base beside the log, stage the log aside, swap, delete.
    *
    * Read-equivalence is by construction: resolution is an associative
    * per-key max_by over the sequence, so
    * `resolve(base ++ future) == resolve(allEpochs ++ future)` —
    *   - surviving keys keep their winning (op→I, values, seq); any
    *     future event carries a strictly higher seq and wins either
    *     way, and `I` vs `U` is irrelevant to max_by resolution;
    *   - deleted keys drop out entirely (not tombstoned): the served
    *     state excludes them, and a future re-insert wins by seq
    *     against nothing just as it would have won against the
    *     tombstone.
    * Epoch markers are NOT touched: a replay of an already-ingested
    * epoch stays a no-op after compaction (the idempotence contract),
    * which is exactly why tombstone rows need no afterlife — a
    * compacted epoch can never be appended twice.
    *
    * Scale shape: one key-partitioned aggregation (the serve plan) and
    * one write, log size drops from O(all change events) to O(live
    * keys); merge-on-read serving cost is bounded again until the next
    * compaction cycle.
    */
  def compact(spark: SparkSession, storePath: String, keyCol: String,
              seqCol: String, opCol: String, valueCols: Seq[String]): Unit = {
    val logPath = s"$storePath/log"
    val order = spark.read.parquet(logPath).columns
    val handled = (Seq(keyCol, seqCol, opCol) ++ valueCols).toSet
    require(order.forall(handled),
      s"log columns ${order.mkString(",")} exceed the resolved set " +
        s"${handled.mkString(",")} — compaction would drop data")
    val base = serve(spark, storePath, keyCol, seqCol, opCol, valueCols)
      .withColumn(opCol, lit("I"))
      .select(order.map(col): _*)
    val fs = new org.apache.hadoop.fs.Path(logPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = logPath + ".compact-tmp"
    // the base materialises fully into tmp BEFORE any rename — the
    // lazy read of logPath is consumed here, never during the swap
    base.write.mode("overwrite").parquet(tmp)
    val p = new org.apache.hadoop.fs.Path(logPath)
    val bak = new org.apache.hadoop.fs.Path(logPath + ".compact-bak")
    require(fs.rename(p, bak), s"could not stage $logPath aside")
    if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), p)) {
      fs.rename(bak, p) // roll back — the original stays authoritative
      throw new IllegalStateException(
        s"swap failed for $logPath; restored original")
    }
    fs.delete(bak, true)
  }
}
