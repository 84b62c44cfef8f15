package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media (image/audio/video) travel as
  * opaque `binary` columns with a typed metadata struct; decode /
  * feature-extraction runs as a partition-wise kernel so heavyweight
  * decoders amortise per-partition setup and batch their input — the
  * same execution shape as a Pandas-UDF `mapInPandas` stage in a
  * PySpark pipeline.
  *
  * The actual codec call is STUBBED (`decodeStub`) because no media
  * libraries exist in this environment: it derives deterministic
  * pseudo-features from the bytes. Everything around it — schema,
  * batching, partitioning, output shape — is real and tested; swapping
  * `decodeStub` for a JNI/process-boundary decoder is a one-function
  * change.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true))), nullable = true)))

  /** Synthesize a media table from any (id, text) table — utf-8 bytes
    * stand in for encoded media so the binary path is exercised
    * end-to-end on the driver testdata.
    */
  def synthesize(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      encode(col(textCol), "UTF-8").as("content"),
      struct(
        lit("synthetic/utf8").as("format"),
        (length(col(textCol)) % 640).cast("int").as("width"),
        (length(col(textCol)) % 480).cast("int").as("height")).as("meta"))

  val FeatureDim = 8

  /** STUB — stands in for a real image/audio decode + feature extract.
    * Deterministic: feature d = mean over the bytes at positions ≡ d
    * (mod FeatureDim), scaled to [0, 1]. Replace with a real codec
    * behind the same signature for production.
    */
  def decodeStub(content: Array[Byte]): Array[Float] = {
    val acc = new Array[Double](FeatureDim)
    val cnt = new Array[Int](FeatureDim)
    var i = 0
    while (i < content.length) {
      val d = i % FeatureDim
      acc(d) += (content(i) & 0xff)
      cnt(d) += 1
      i += 1
    }
    Array.tabulate(FeatureDim)(d =>
      if (cnt(d) == 0) 0f else (acc(d) / cnt(d) / 255.0).toFloat)
  }

  /** STUB resize kernel — stands in for an image resize: subsamples the
    * byte stream to m = min(outLen, n) bytes, byte i = input byte
    * (i·n)/m (nearest-neighbour downsample along the stream). Replace
    * with a real codec resize behind the same signature.
    */
  def resizeStub(content: Array[Byte], outLen: Int): Array[Byte] = {
    val n = content.length
    val m = math.min(outLen, n)
    Array.tabulate(m)(i => content((i.toLong * n / m).toInt))
  }

  /** Partition-wise resize: mapPartitions (decoder-amortising shape,
    * like extractFeatures), emitting the resized payload's length and
    * md5 plus the target dimensions — a flat, engine-portable summary
    * of the binary output.
    */
  def resize(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    require(targetW > 0 && targetH > 0, "target dimensions must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    val outLen = targetW * targetH
    val ds = media
      .select(col("media_id"), coalesce(col("content"), lit(Array.empty[Byte])))
      .as[(Long, Array[Byte])]
    ds.mapPartitions { rows =>
      // per-partition decoder init would go here
      rows.map { case (id, bytes) => (id, resizeStub(bytes, outLen)) }
    }.toDF("media_id", "resized")
      .select(col("media_id"), lit(targetW).as("out_w"), lit(targetH).as("out_h"),
        length(col("resized")).cast("long").as("n_bytes"),
        // digest the HEX STRING of the payload, not the raw binary:
        // byte-for-byte equivalent as a content digest, and computable
        // by any comparison engine that can express the byte sequence
        // but not hash a blob
        md5(hex(col("resized"))).as("content_md5"))
  }

  /** Partition-wise frame sampling — the video path: the payload is
    * treated as consecutive `frameBytes`-sized frames and every
    * `everyN`-th frame becomes its own row (media_id, frame_idx,
    * frame_len, frame_md5) — the explode shape a real decoder's
    * keyframe sampler would produce.
    */
  def frameSample(media: DataFrame, frameBytes: Int, everyN: Int): DataFrame = {
    require(frameBytes > 0 && everyN > 0, "frameBytes and everyN must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    val ds = media
      .select(col("media_id"), coalesce(col("content"), lit(Array.empty[Byte])))
      .as[(Long, Array[Byte])]
    ds.mapPartitions { rows =>
      rows.flatMap { case (id, bytes) =>
        val nFrames = (bytes.length + frameBytes - 1) / frameBytes
        Iterator.range(0, nFrames)
          .filter(_ % everyN == 0)
          .map(i => (id, i,
            java.util.Arrays.copyOfRange(bytes, i * frameBytes,
              math.min((i + 1) * frameBytes, bytes.length))))
      }
    }.toDF("media_id", "frame_idx", "frame")
      .select(col("media_id"), col("frame_idx"),
        length(col("frame")).cast("long").as("frame_len"),
        // hex-string digest — see resize
        md5(hex(col("frame"))).as("frame_md5"))
  }

  /** Partition-wise decode + feature extraction: one `mapPartitions`
    * pass so a real decoder could initialise once per partition and
    * process its rows as a batch (the `mapInPandas` execution shape).
    * The fixed-width feature vector is projected to scalar columns
    * `f0..f{FeatureDim-1}` — a flat, sortable schema that any
    * downstream consumer (or comparison harness) can handle without
    * array support.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] = media
      .select(col("media_id"), coalesce(col("content"), lit(Array.empty[Byte])))
      .as[(Long, Array[Byte])]
    val raw = ds.mapPartitions { rows =>
      // per-partition decoder init would go here
      rows.map { case (id, bytes) => (id, bytes.length.toLong, decodeStub(bytes)) }
    }.toDF("media_id", "n_bytes", "features")
    raw.select(
      col("media_id") +: col("n_bytes") +:
        (0 until FeatureDim).map(d => col("features")(d).cast("double").as(s"f$d")): _*)
  }
}
