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

  /** Resolve the current state from the accumulated log. */
  def serve(spark: SparkSession, storePath: String, keyCol: String,
            seqCol: String, opCol: String,
            valueCols: Seq[String]): DataFrame =
    graft.relational.Scd.cdcApply(
      spark.read.parquet(s"$storePath/log"),
      keyCol, seqCol, opCol, valueCols)
}
