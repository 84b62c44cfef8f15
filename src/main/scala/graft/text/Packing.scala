package graft.text

import graft.sampling.Sampling
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget shard packing — assign every document to a bounded
  * training shard so that each shard holds at most ~`tokensPerShard`
  * tokens (the unit a pretraining loader streams). Deterministic:
  * the same corpus always packs into the same shards.
  *
  * Scale shape: a single GLOBAL greedy cumsum would serialise the
  * whole corpus through one partition, so packing is two-level —
  * documents hash into `nBuckets` independent buckets (a salted md5
  * band, reproducible anywhere), and the greedy token cumsum runs
  * per bucket under `Window.partitionBy(bucket)`. Parallelism is
  * `nBuckets` regardless of corpus size; each shard is
  * budget-bounded by construction because cumsums never cross
  * buckets. The cost vs a global pack is at most one underfull
  * trailing shard per bucket.
  */
object Packing {

  /** Numeric value of the first four hex digits of the row's salted
    * md5 draw — a uniform 16-bit bucket key computable with identical
    * arithmetic in any SQL dialect (per-digit strpos over the hex
    * alphabet; no engine-specific hex-parse builtin).
    */
  def hexBand(key: Column, salt: String): Column = {
    val h = Sampling.hashKey(key, salt)
    (1 to 4).map { i =>
      (instr(lit("0123456789abcdef"), substring(h, i, 1)) - 1) *
        math.pow(16, 4 - i).toLong
    }.reduce(_ + _)
  }

  /** Pack `docs` into (bucket, shard) cells of ≤ ~tokensPerShard
    * whitespace tokens (documents larger than the budget get a shard
    * of their own — a document is never split).
    *
    * @return (doc_id, n_tokens, bucket, shard) — `shard` is the
    *   bucket-local ordinal; (bucket, shard) is the global shard key.
    */
  /** @param tokenCounter the budget denominator — whitespace tokens by
    *   default; pass `Bpe.tokenCount(_, vocab)` for tokenizer-real
    *   budgets a pretraining loader can trust.
    */
  def packShards(docs: DataFrame, tokensPerShard: Long, nBuckets: Int,
                 salt: String, idCol: String = "doc_id",
                 textCol: String = "text",
                 tokenCounter: Column => Column = TextOps.tokenCount): DataFrame = {
    require(nBuckets > 0 && tokensPerShard > 0,
      "nBuckets and tokensPerShard must be positive")
    val h = Sampling.hashKey(col(idCol), salt)
    val withKey = docs.select(col(idCol),
      tokenCounter(col(textCol)).cast("long").as("n_tokens"),
      pmod(hexBand(col(idCol), salt), lit(nBuckets)).cast("long").as("bucket"),
      h.as("__h"))
    // greedy pack in hash order: a doc's shard is the budget-quotient
    // of the tokens BEFORE it (so the first doc of every bucket lands
    // in shard 0 and an over-budget doc still joins the shard its
    // prefix opened — never split, possibly overflowing by one doc)
    val w = Window.partitionBy(col("bucket")).orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    withKey
      .withColumn("shard",
        floor(coalesce(sum(col("n_tokens")).over(w), lit(0L)) / tokensPerShard))
      .drop("__h")
  }

  /** Context-window packing — the sequence-assembly twin of
    * [[packShards]]: greedily pack documents (typically pre-chunked to
    * ≤ `contextTokens`) into fixed-budget TRAINING SEQUENCES, emitting
    * for each document its sequence ordinal and its token OFFSET
    * within that sequence, so a loader can place every document at
    * token positions [offset, offset + n_tokens) of sequence
    * (bucket, seq) without re-scanning anything. Same two-level
    * bucket-cumsum shape (parallelism = nBuckets at any corpus size,
    * no global sort); a document longer than the budget still joins
    * the sequence its prefix opened — never split — and overflows it,
    * which the loader handles by truncation (offset + n_tokens >
    * contextTokens marks exactly those rows).
    *
    * @return (idCol, n_tokens, bucket, seq, offset)
    */
  def packSequences(docs: DataFrame, contextTokens: Long, nBuckets: Int,
                    salt: String, idCol: String = "doc_id",
                    textCol: String = "text",
                    tokenCounter: Column => Column = TextOps.tokenCount): DataFrame = {
    require(nBuckets > 0 && contextTokens > 0,
      "nBuckets and contextTokens must be positive")
    val h = Sampling.hashKey(col(idCol), salt)
    val withKey = docs.select(col(idCol),
      tokenCounter(col(textCol)).cast("long").as("n_tokens"),
      pmod(hexBand(col(idCol), salt), lit(nBuckets)).cast("long").as("bucket"),
      h.as("__h"))
    val w = Window.partitionBy(col("bucket")).orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    withKey
      .withColumn("__prefix", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("seq", floor(col("__prefix") / contextTokens))
      .withColumn("offset", col("__prefix") - col("seq") * contextTokens)
      .drop("__h", "__prefix")
  }

  /** Scale-adaptive bucket count (r6 verdict item 5): a caller-fixed
    * `nBuckets` is a footgun at 100 TB — 8 buckets serialise a
    * petascale pack through 8 cumsum partitions, while 4096 buckets on
    * a laptop corpus yield one underfull trailing shard each. The
    * derived default targets ~`unitsPerBucket` budget units (shards or
    * sequences) of token mass per bucket:
    * `ceil(totalTokens / (unitTokens × unitsPerBucket))`, min 1 —
    * bucket count grows linearly with the corpus, per-bucket work
    * stays ~constant (`unitsPerBucket × unitTokens` tokens), and the
    * underfull-trailing-shard waste stays bounded at 1/unitsPerBucket
    * of the budget per bucket.
    */
  /** Backstop on the derived bucket count: 2²⁰ buckets is ~3 orders
    * beyond a 100 TB corpus at sane budgets (25 T tokens / (4096-token
    * contexts × 4096 per bucket) ≈ 1.5 k buckets) — the cap exists so
    * degenerate inputs (unit budget 1) can't overflow Int or request
    * more partitions than any cluster schedules.
    */
  val MaxDerivedBuckets: Int = 1 << 20

  def deriveBuckets(totalTokens: Long, unitTokens: Long,
                    unitsPerBucket: Int = 64): Int = {
    require(unitTokens > 0 && unitsPerBucket > 0,
      "unitTokens and unitsPerBucket must be positive")
    val ideal = math.ceil(
      totalTokens.toDouble / (unitTokens.toDouble * unitsPerBucket))
    math.min(math.max(ideal, 1.0), MaxDerivedBuckets.toDouble).toInt
  }

  /** Whitespace-token mass of the corpus — one map-side-combined
    * aggregate scan. A production deployment with table statistics can
    * pass its known total to [[deriveBuckets]] instead of paying the
    * scan.
    */
  def totalTokens(docs: DataFrame, textCol: String = "text"): Long =
    docs.agg(sum(TextOps.tokenCount(col(textCol)).cast("long")))
      .head.getLong(0)

  /** [[packShards]] with the bucket count derived from the corpus'
    * own token mass — the no-footgun default entry point.
    */
  def packShardsAuto(docs: DataFrame, tokensPerShard: Long, salt: String,
                     shardsPerBucket: Int = 64, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame =
    packShards(docs, tokensPerShard,
      deriveBuckets(totalTokens(docs, textCol), tokensPerShard, shardsPerBucket),
      salt, idCol, textCol)

  /** [[packSequences]] with the bucket count derived from the corpus'
    * own token mass.
    */
  def packSequencesAuto(docs: DataFrame, contextTokens: Long, salt: String,
                        seqsPerBucket: Int = 4096, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame =
    packSequences(docs, contextTokens,
      deriveBuckets(totalTokens(docs, textCol), contextTokens, seqsPerBucket),
      salt, idCol, textCol)

  /** Materialise the packed corpus as one parquet directory per
    * (bucket, shard): `path/bucket=B/shard=S/…`. A training loader
    * streams one shard directory at a time (each ≤ ~tokensPerShard
    * tokens); directory-level pruning makes "read shard (b, s)" a
    * planning-time partition filter, no scan of the rest. The write
    * re-joins the assignment to the FULL document rows (packShards
    * returns only the packing key columns), keyed by `idCol` — one
    * shuffle, broadcastable when the assignment side is small.
    */
  /** Per-shard manifest of a [[packShards]] assignment: document and
    * token totals, the doc-id range, and an order-insensitive content
    * checksum (sum of a salted 16-bit md5 band over
    * `doc_id_n_tokens`) — what a loader checks before trusting a
    * shard, and what an incremental re-pack diffes against the
    * previous manifest to find changed shards.
    *
    * One map-side-combined hash aggregation over the packing output;
    * parallelism and skew follow packShards' bucket design.
    */
  def shardManifest(docs: DataFrame, tokensPerShard: Long, nBuckets: Int,
                    salt: String, idCol: String = "doc_id",
                    textCol: String = "text",
                    tokenCounter: Column => Column = TextOps.tokenCount): DataFrame =
    packShards(docs, tokensPerShard, nBuckets, salt, idCol, textCol, tokenCounter)
      .groupBy(col("bucket"), col("shard"))
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col(idCol)).as("min_doc_id"),
        max(col(idCol)).as("max_doc_id"),
        sum(hexBand(concat_ws("_", col(idCol), col("n_tokens")), s"$salt:mf"))
          .as("checksum"))

  def writeShards(docs: DataFrame, path: String, tokensPerShard: Long,
                  nBuckets: Int, salt: String, idCol: String = "doc_id",
                  textCol: String = "text"): Unit = {
    val assignment = packShards(docs, tokensPerShard, nBuckets, salt,
      idCol, textCol).select(col(idCol), col("bucket"), col("shard"))
    docs.join(assignment, idCol)
      .write.mode("overwrite")
      .partitionBy("bucket", "shard")
      .parquet(path)
  }

  /** Compact a partitioned dataset's small files: rewrite so each
    * partition directory holds ONE file (its rows were written by many
    * tasks; after compaction a training loader opens one file per
    * shard). Small files are the chronic failure mode of incremental
    * ingest at scale — footer/open overhead per file and NameNode/
    * listing pressure grow with file COUNT, not data size.
    *
    * The rewrite lands beside the original and swaps in with two
    * renames (atomic on HDFS/local; on object stores run it from a
    * driver that owns the path). One shuffle keyed by the partition
    * columns; values inside each rewritten file keep a deterministic
    * `orderCol` order so compaction is byte-stable.
    */
  def compactPartitions(spark: org.apache.spark.sql.SparkSession, path: String,
                        partitionCols: Seq[String], orderCol: String): Unit = {
    val df = spark.read.parquet(path)
    val tmp = path + ".compact-tmp"
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols :+ orderCol).map(col): _*)
      .write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .option("maxRecordsPerFile", 0) // unlimited — one writer per dir
      .parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    val bak = new org.apache.hadoop.fs.Path(path + ".compact-bak")
    require(fs.rename(p, bak), s"could not stage $path aside")
    if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), p)) {
      fs.rename(bak, p) // roll back — the original stays authoritative
      throw new IllegalStateException(s"swap failed for $path; restored original")
    }
    fs.delete(bak, true)
  }
}
