package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming twin of
  * [[graft.relational.Engagement.rollingDistinctUsers]] — the
  * production shape for "rolling 7-day distinct actives" over an
  * unbounded event stream: each micro-batch appends its per-day HLL
  * sketch PARTIALS to a day-keyed store; serving merges partials per
  * day and unions each day into its rolling window. No cross-batch
  * executor state at all — HLL union is register-wise max, so any
  * number of per-epoch partials for the same day merge to exactly the
  * sketch a single batch pass would have built, in any order. Late
  * events simply append another partial to their (old) day.
  *
  * foreachBatch is the right altitude (the indexIngest discipline,
  * [[EmbedStream]]): the per-batch work is a stateless day-keyed
  * aggregation; plain parquet append is only at-least-once under
  * replay, so each epoch commits an `epochs/<batchId>` marker after
  * its append and a replayed epoch whose marker exists is skipped.
  *
  * At 100 TB: the store grows by #days-per-batch sketch rows (KBs) per
  * epoch however large the batch; serving cost is #days×#epochs tiny
  * sketch rows, compacted like any other partition
  * ([[graft.text.Packing.compactPartitions]]).
  */
object DauStream {

  /** One epoch's ingest body — also the batch-mode path the
    * correctness gate drives directly: append this frame's per-day
    * sketch partials to `storePath` (idempotent per `epoch`).
    */
  def ingestEpoch(events: DataFrame, storePath: String, epoch: Long,
                  idCol: String = "user_id"): Unit = {
    val spark = events.sparkSession
    val marker = new org.apache.hadoop.fs.Path(s"$storePath/epochs/$epoch")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker) && !events.isEmpty) {
      graft.relational.Engagement.dailySketches(events, idCol)
        .withColumn("epoch", lit(epoch))
        .write.mode("append").parquet(s"$storePath/sketches")
      fs.create(marker, true).close()
    }
  }

  /** The streaming writer: start with `.start()` (+ a checkpoint
    * location for restart recovery).
    */
  def ingest(events: DataFrame, storePath: String,
             idCol: String = "user_id")
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestEpoch(batch, storePath, batchId, idCol)
      }

  /** Serve the rolling estimate from the store: merge each day's
    * partials, union into the trailing window.
    */
  def serveRolling(spark: SparkSession, storePath: String,
                   windowDays: Int = 7): DataFrame =
    graft.relational.Engagement.rollingSketchEstimate(
      spark.read.parquet(s"$storePath/sketches").select("day", "__sk"),
      windowDays)
}
