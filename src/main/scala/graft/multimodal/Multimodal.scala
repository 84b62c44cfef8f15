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
  * The IMAGE and AUDIO paths are real: PNG/JPEG payloads are decoded
  * with the JDK's `javax.imageio.ImageIO` and WAV/AIFF PCM with
  * `javax.sound.sampled` (no extra dependencies), so features and
  * resizes operate on actual decoded pixels/samples.
  * `synthesizeImages`/`synthesizeAudio` emit genuine PNG/WAV bytes
  * whose content is a deterministic function of the source text —
  * both formats are lossless, so decodes round-trip exactly and a SQL
  * oracle verifies the decoded output by recomputing the pixel/sample
  * function, without decoding media itself. Formats neither library
  * covers (video codecs, compressed audio) fall back to the
  * deterministic byte-kernel stubs (`decodeStub`, `resizeStub`);
  * swapping those for a JNI/process-boundary decoder is a
  * one-function change behind the same dispatch.
  */
object Multimodal {

  // ImageIO's default scratch-file cache would put a disk write on
  // every executor-side decode; in-memory streams only.
  javax.imageio.ImageIO.setUseCache(false)

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

  /** Synthesize a REAL PNG media table from any (id, text) table. The
    * image is grayscale with deterministic, SQL-recomputable content:
    * width = 8 + id mod 24, height = 8 + n mod 24 (n = UTF-8 byte
    * count), and the gray value of the row-major pixel p is text byte
    * p mod n (0 for empty text). Encoded as PNG per row inside one
    * mapPartitions pass (encoder init amortised per partition); PNG is
    * lossless, so downstream decodes recover these exact pixels.
    */
  def synthesizeImages(docs: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ds = docs
      .select(col(idCol).cast("long"), coalesce(col(textCol), lit("")))
      .as[(Long, String)]
    ds.mapPartitions { rows =>
      rows.map { case (id, text) =>
        val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val n = bytes.length
        val w = (8 + (((id % 24) + 24) % 24)).toInt
        val h = 8 + n % 24
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var p = 0
        while (p < w * h) {
          val g = if (n == 0) 0 else bytes(p % n) & 0xff
          img.setRGB(p % w, p / w, (g << 16) | (g << 8) | g)
          p += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        (id, bos.toByteArray, "image/png", w, h)
      }
    }.toDF("media_id", "content", "format", "width", "height")
      .select(col("media_id"), col("content"),
        struct(col("format"), col("width"), col("height")).as("meta"))
  }

  /** Real image decode (PNG/JPEG/GIF/BMP — whatever the JVM's ImageIO
    * readers cover). None when the payload is not a decodable image —
    * callers fall back to the byte-kernel stubs.
    */
  def decodeImage(content: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (content == null || content.length == 0) None
    else try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content)))
    catch { case _: java.io.IOException => None }

  /** Synthesize a REAL WAV media table: 16-bit mono PCM at 8 kHz with
    * deterministic, SQL-recomputable content — sample k is
    * ((byte[k mod n] & 0xff) − 128)·256 over the text's UTF-8 bytes
    * (−32768 for empty text), nSamples = 64 + n mod 192. WAV PCM is
    * lossless, so `decodeAudio` recovers these exact samples and a SQL
    * oracle can verify real decoded features by recomputing the sample
    * function — the same device as `synthesizeImages`/PNG.
    */
  def synthesizeAudio(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ds = docs
      .select(col(idCol).cast("long"), coalesce(col(textCol), lit("")))
      .as[(Long, String)]
    ds.mapPartitions { rows =>
      rows.map { case (id, text) =>
        val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val n = bytes.length
        val nSamples = 64 + n % 192
        val pcm = new Array[Byte](nSamples * 2)
        var k = 0
        while (k < nSamples) {
          val b = if (n == 0) 0 else bytes(k % n) & 0xff
          val s = (b - 128) * 256
          pcm(2 * k) = (s & 0xff).toByte          // little-endian
          pcm(2 * k + 1) = ((s >> 8) & 0xff).toByte
          k += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        (id, bos.toByteArray, "audio/wav", nSamples, 1)
      }
    }.toDF("media_id", "content", "format", "width", "height")
      .select(col("media_id"), col("content"),
        struct(col("format"), col("width"), col("height")).as("meta"))
  }

  /** Synthesize a REAL multi-frame animated GIF per document — the
    * zero-dependency route to real decoded VIDEO frames: `ImageIO`'s
    * GIF plugin reads every frame of an animated GIF, so the frame
    * sampler can operate on actual decoded pixels while true video
    * codecs (which the JDK lacks) keep the byte stub behind the same
    * dispatch.
    *
    * Deterministic, SQL-recomputable content: w = 6 + id mod 10,
    * h = 6 + n mod 10 (n = UTF-8 byte count), nFrames = 2 + id mod 3,
    * and the gray of frame f's row-major pixel p is text byte
    * (p + 7·f) mod n (0 for empty text) — the 7·f phase shift makes
    * every frame distinct. Images are indexed over an explicit
    * 256-gray palette, so the GIF encoding is LOSSLESS and the real
    * decode round-trips exactly (the PNG/WAV device, one format over).
    */
  def synthesizeGifs(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ds = docs
      .select(col(idCol).cast("long"), coalesce(col(textCol), lit("")))
      .as[(Long, String)]
    ds.mapPartitions { rows =>
      // 256-gray palette: index i IS gray i, so sample values survive
      // the palette round-trip bit-for-bit
      val grays = Array.tabulate(256)(_.toByte)
      val cm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
      rows.map { case (id, text) =>
        val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val n = bytes.length
        val w = (6 + (((id % 10) + 10) % 10)).toInt
        val h = 6 + n % 10
        val nFrames = (2 + (((id % 3) + 3) % 3)).toInt
        val bos = new java.io.ByteArrayOutputStream()
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("gif").next()
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var f = 0
        while (f < nFrames) {
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
          val raster = img.getRaster
          var p = 0
          while (p < w * h) {
            val g = if (n == 0) 0 else bytes((p + 7 * f) % n) & 0xff
            raster.setSample(p % w, p / w, 0, g)
            p += 1
          }
          writer.writeToSequence(
            new javax.imageio.IIOImage(img, null, null), null)
          f += 1
        }
        writer.endWriteSequence()
        writer.dispose()
        ios.close()
        (id, bos.toByteArray, "image/gif", w, h)
      }
    }.toDF("media_id", "content", "format", "width", "height")
      .select(col("media_id"), col("content"),
        struct(col("format"), col("width"), col("height")).as("meta"))
  }

  /** Real multi-frame image decode: every frame of an animated GIF (or
    * the single frame of any other ImageIO-readable format). None when
    * no installed reader claims the payload — callers fall back to the
    * byte-frame stub.
    */
  def decodeImageFrames(content: Array[Byte]): Option[IndexedSeq[java.awt.image.BufferedImage]] =
    if (content == null || content.length == 0) None
    else try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(content))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) { iis.close(); None }
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val k = reader.getNumImages(true)
          Some((0 until k).map(reader.read))
        } finally { reader.dispose(); iis.close() }
      }
    } catch { case _: java.io.IOException => None }

  /** Real audio decode via the JDK's `javax.sound.sampled` (WAV/AIFF/AU
    * PCM — no codecs beyond the JRE). Returns the sample rate and the
    * 16-bit samples; None when the payload is not decodable audio.
    */
  def decodeAudio(content: Array[Byte]): Option[(Float, Array[Short])] =
    if (content == null || content.length == 0) None
    else try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16) None
        else {
          val raw = ais.readAllBytes()
          val out = new Array[Short](raw.length / 2)
          var i = 0
          while (i < out.length) {
            val (lo, hi) =
              if (fmt.isBigEndian) (raw(2 * i + 1) & 0xff, raw(2 * i).toInt)
              else (raw(2 * i) & 0xff, raw(2 * i + 1).toInt)
            out(i) = ((hi << 8) | lo).toShort
            i += 1
          }
          Some((fmt.getSampleRate, out))
        }
      } finally ais.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** Partition-wise audio decode + feature extraction over REAL
    * decoded samples: per payload the sample rate, sample count, mean
    * amplitude, RMS, and zero-crossing count — the standard cheap
    * audio-quality signals. Sample sums are integer-valued (exact in
    * double, order-free) and division/sqrt are IEEE-exactly rounded,
    * so the features are bit-reproducible by a SQL oracle from the
    * synthesized sample function. Non-audio payloads report
    * decoded = false with -1/0 features.
    *
    * @return (media_id, decoded, sample_rate INT, n_samples BIGINT,
    *   mean_amp, rms — DOUBLE, zero_crossings BIGINT)
    */
  def extractAudioFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val ds = media
      .select(col("media_id"), coalesce(col("content"), lit(Array.empty[Byte])))
      .as[(Long, Array[Byte])]
    ds.mapPartitions { rows =>
      rows.map { case (id, bytes) =>
        decodeAudio(bytes) match {
          case Some((rate, samples)) =>
            var sum = 0.0; var sq = 0.0; var zc = 0L
            var i = 0
            while (i < samples.length) {
              val v = samples(i).toDouble
              sum += v; sq += v * v
              if (i > 0 && (samples(i) < 0) != (samples(i - 1) < 0)) zc += 1
              i += 1
            }
            val n = samples.length.max(1)
            (id, true, rate.toInt, samples.length.toLong,
              sum / n, math.sqrt(sq / n), zc)
          case None =>
            (id, false, -1, 0L, 0.0, 0.0, 0L)
        }
      }
    }.toDF("media_id", "decoded", "sample_rate", "n_samples",
      "mean_amp", "rms", "zero_crossings")
  }

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

  /** Feature kernel over REAL decoded pixels: the image is split into
    * `FeatureDim` vertical strips (column x belongs to strip
    * x·FeatureDim/w) and feature d = mean gray of strip d, scaled to
    * [0, 1] through float32 exactly like `decodeStub`. Gray = low
    * byte of the packed RGB (channels are equal for grayscale images;
    * for color this is the blue plane — still a deterministic,
    * oracle-checkable projection). Pixel sums are integer-valued in
    * double, so accumulation order cannot change the result.
    */
  def imageFeatures(img: java.awt.image.BufferedImage): Array[Float] = {
    val w = img.getWidth
    val h = img.getHeight
    val acc = new Array[Double](FeatureDim)
    val cnt = new Array[Int](FeatureDim)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val d = x * FeatureDim / w
        acc(d) += (img.getRGB(x, y) & 0xff)
        cnt(d) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(FeatureDim)(d =>
      if (cnt(d) == 0) 0f else (acc(d) / cnt(d) / 255.0).toFloat)
  }

  /** REAL nearest-neighbour image resize: output gray byte at (X, Y) =
    * source pixel (X·w/W, Y·h/H) (integer division — the same mapping
    * a SQL oracle expresses with `//`), emitted as W·H row-major gray
    * bytes. Nearest-neighbour rather than an interpolating kernel so
    * the output is bit-exactly reproducible by any engine; swapping in
    * `AffineTransformOp` bilinear is a local change if fidelity ever
    * outranks verifiability.
    */
  def imageResizeGray(img: java.awt.image.BufferedImage,
                      outW: Int, outH: Int): Array[Byte] = {
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Byte](outW * outH)
    var yy = 0
    while (yy < outH) {
      var xx = 0
      val sy = yy * h / outH
      while (xx < outW) {
        out(yy * outW + xx) = (img.getRGB(xx * w / outW, sy) & 0xff).toByte
        xx += 1
      }
      yy += 1
    }
    out
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
    * of the binary output. Decodable images take the REAL pixel path
    * (`decodeImage` + `imageResizeGray`, always targetW·targetH
    * bytes); opaque payloads fall back to the byte-subsample stub.
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
      rows.map { case (id, bytes) =>
        decodeImage(bytes) match {
          case Some(img) => (id, imageResizeGray(img, targetW, targetH))
          case None      => (id, resizeStub(bytes, outLen))
        }
      }
    }.toDF("media_id", "resized")
      .select(col("media_id"), lit(targetW).as("out_w"), lit(targetH).as("out_h"),
        length(col("resized")).cast("long").as("n_bytes"),
        // digest the HEX STRING of the payload, not the raw binary:
        // byte-for-byte equivalent as a content digest, and computable
        // by any comparison engine that can express the byte sequence
        // but not hash a blob
        md5(hex(col("resized"))).as("content_md5"))
  }

  /** Partition-wise frame sampling — the video path. Payloads any
    * installed `ImageIO` reader decodes (multi-frame animated GIFs in
    * particular — see [[synthesizeGifs]]) take the REAL path: every
    * `everyN`-th decoded frame becomes a row carrying its pixel count,
    * mean gray, and a digest of the actual row-major gray bytes.
    * Opaque payloads (true video codecs, which the JDK cannot decode)
    * fall back to the byte-frame stub — consecutive `frameBytes`-sized
    * slices, the same per-frame stats over raw bytes — behind the same
    * dispatch, flagged `decoded = false`.
    *
    * Mean over integer-valued sums and the hex-string digest keep both
    * paths bit-reproducible by a SQL oracle.
    *
    * @return (media_id, frame_idx INT, decoded BOOLEAN,
    *   frame_len BIGINT, mean_gray DOUBLE, frame_md5)
    */
  def frameSample(media: DataFrame, frameBytes: Int, everyN: Int): DataFrame = {
    require(frameBytes > 0 && everyN > 0, "frameBytes and everyN must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    val ds = media
      .select(col("media_id"), coalesce(col("content"), lit(Array.empty[Byte])))
      .as[(Long, Array[Byte])]
    // mean over integer-valued byte sums: exact in double, order-free
    def meanOf(a: Array[Byte]): Double =
      if (a.isEmpty) 0.0
      else a.foldLeft(0L)((s, b) => s + (b & 0xff)).toDouble / a.length
    ds.mapPartitions { rows =>
      rows.flatMap { case (id, bytes) =>
        decodeImageFrames(bytes) match {
          case Some(frames) =>
            Iterator.range(0, frames.length)
              .filter(_ % everyN == 0)
              .map { i =>
                val img = frames(i)
                val w = img.getWidth
                val h = img.getHeight
                val gray = new Array[Byte](w * h)
                var p = 0
                while (p < w * h) {
                  gray(p) = (img.getRGB(p % w, p / w) & 0xff).toByte
                  p += 1
                }
                (id, i, true, meanOf(gray), gray)
              }
          case None =>
            val nFrames = (bytes.length + frameBytes - 1) / frameBytes
            Iterator.range(0, nFrames)
              .filter(_ % everyN == 0)
              .map { i =>
                val fr = java.util.Arrays.copyOfRange(bytes, i * frameBytes,
                  math.min((i + 1) * frameBytes, bytes.length))
                (id, i, false, meanOf(fr), fr)
              }
        }
      }
    }.toDF("media_id", "frame_idx", "decoded", "mean_gray", "frame")
      .select(col("media_id"), col("frame_idx"), col("decoded"),
        length(col("frame")).cast("long").as("frame_len"),
        col("mean_gray"),
        // hex-string digest — see resize
        md5(hex(col("frame"))).as("frame_md5"))
  }

  /** Partition-wise decode + feature extraction: one `mapPartitions`
    * pass so the decoder initialises once per partition and processes
    * its rows as a batch (the `mapInPandas` execution shape).
    * Decodable images report their REAL decoded dimensions and
    * pixel-strip features (`imageFeatures`); opaque payloads fall back
    * to the byte-kernel stub with `decoded = false` and -1 dimensions.
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
      rows.map { case (id, bytes) =>
        decodeImage(bytes) match {
          case Some(img) =>
            (id, true, img.getWidth, img.getHeight, imageFeatures(img))
          case None =>
            (id, false, -1, -1, decodeStub(bytes))
        }
      }
    }.toDF("media_id", "decoded", "width", "height", "features")
    raw.select(
      col("media_id") +: col("decoded") +: col("width") +: col("height") +:
        (0 until FeatureDim).map(d => col("features")(d).cast("double").as(s"f$d")): _*)
  }

  /** Perceptual image hash (dHash): nearest-neighbour-resample the
    * decoded image to a 9×8 gray grid and emit 64 bits, bit (x, y) = 1
    * iff gray(x, y) > gray(x+1, y) — the standard gradient fingerprint
    * that survives re-encoding, mild rescaling and brightness shifts,
    * where an exact byte hash sees a different file. Returned as a
    * 64-char '0'/'1' string (the simhash64 portability convention).
    *
    * Scale shape: mapPartitions decode (codec init amortised per
    * partition), zero shuffle — hashing is scan-side whatever the
    * corpus size. Undecodable payloads hash their byte-subsample stub
    * (zero-padded), flagged by the decoded column.
    */
  def imageDHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val ds = media
      .select(col("media_id"), coalesce(col("content"), lit(Array.empty[Byte])))
      .as[(Long, Array[Byte])]
    ds.mapPartitions { rows =>
      rows.map { case (id, bytes) =>
        val (gray0, decoded) = decodeImage(bytes) match {
          case Some(img) => (imageResizeGray(img, 9, 8).map(_ & 0xff), true)
          case None      => (resizeStub(bytes, 72).map(_ & 0xff), false)
        }
        val gray = if (gray0.length >= 72) gray0
                   else gray0 ++ Array.fill(72 - gray0.length)(0)
        val sb = new java.lang.StringBuilder(64)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            sb.append(if (gray(y * 9 + x) > gray(y * 9 + x + 1)) '1' else '0')
            x += 1
          }
          y += 1
        }
        (id, sb.toString, decoded)
      }
    }.toDF("media_id", "dhash", "decoded")
  }

  /** Audio fingerprint — dHash's audio twin: the decoded sample stream
    * splits into 65 nearest-neighbour frames and bit f = 1 iff
    * energy(frame f) > energy(frame f+1) — a 64-bit energy-gradient
    * signature robust to gain changes in shape (energies are exact
    * integer sums of squares, so the fingerprint is engine-exact, no
    * float tolerance). Undecodable payloads fingerprint their byte
    * stub, flagged by `decoded`.
    */
  def audioFingerprint(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val ds = media
      .select(col("media_id"), coalesce(col("content"), lit(Array.empty[Byte])))
      .as[(Long, Array[Byte])]
    ds.mapPartitions { rows =>
      rows.map { case (id, bytes) =>
        val (samples, decoded) = decodeAudio(bytes) match {
          case Some((_, s)) => (s.map(_.toLong), true)
          case None => (resizeStub(bytes, 130).map(b => (b & 0xff).toLong), false)
        }
        val ns = math.max(samples.length, 1).toLong
        val e = Array.tabulate(65) { f =>
          var acc = 0L
          // Long boundary arithmetic: f*ns overflows Int past ~33M
          // samples (~12 min at 44.1 kHz), garbling the frame ranges
          var k = (f.toLong * ns / 65).toInt
          val end = ((f + 1).toLong * ns / 65).toInt
          while (k < end && k < samples.length) {
            acc += samples(k) * samples(k); k += 1
          }
          acc
        }
        val sb = new java.lang.StringBuilder(64)
        var f = 0
        while (f < 64) {
          sb.append(if (e(f) > e(f + 1)) '1' else '0'); f += 1
        }
        (id, sb.toString, decoded)
      }
    }.toDF("media_id", "afp", "decoded")
  }

  /** Per-frame video fingerprint: dHash every decoded frame of an
    * animated payload — near-duplicate video detection keys on the
    * SEQUENCE of frame hashes (re-encoded copies keep the gradient
    * signature frame by frame). One output row per (media, frame);
    * undecodable payloads yield frame −1 over the byte stub.
    */
  def videoFrameDHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    def hashGray(gray0: Array[Int]): String = {
      val gray = if (gray0.length >= 72) gray0
                 else gray0 ++ Array.fill(72 - gray0.length)(0)
      val sb = new java.lang.StringBuilder(64)
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          sb.append(if (gray(y * 9 + x) > gray(y * 9 + x + 1)) '1' else '0')
          x += 1
        }
        y += 1
      }
      sb.toString
    }
    val ds = media
      .select(col("media_id"), coalesce(col("content"), lit(Array.empty[Byte])))
      .as[(Long, Array[Byte])]
    ds.mapPartitions { rows =>
      rows.flatMap { case (id, bytes) =>
        decodeImageFrames(bytes) match {
          case Some(frames) => frames.zipWithIndex.map { case (img, f) =>
            (id, f, hashGray(imageResizeGray(img, 9, 8).map(_ & 0xff)), true)
          }
          case None =>
            Seq((id, -1, hashGray(resizeStub(bytes, 72).map(_ & 0xff)), false))
        }
      }
    }.toDF("media_id", "frame_idx", "dhash", "decoded")
  }

  /** Image dedup by perceptual hash: exact dHash groups with the
    * smallest-id canonical — the keep-one convention every dedup
    * operator here shares. One hash aggregation on the 64-bit key +
    * a key-equi join back; no window, no pairwise products.
    */
  def dedupByDHash(media: DataFrame): DataFrame = {
    val h = imageDHash(media)
    val canon = h.groupBy("dhash")
      .agg(min("media_id").as("canonical_id"),
        count(lit(1)).cast("long").as("group_size"))
    h.join(canon, "dhash")
      .select(col("media_id"), col("dhash"), col("canonical_id"),
        col("group_size"),
        (col("media_id") =!= col("canonical_id")).cast("int").as("is_duplicate"))
  }

  /** Perceptual NEAR-dup image pairs: banded hamming self-join over the
    * dHash signatures (the simhash64 blocking, reused bit-for-bit via
    * [[graft.dedup.Dedup.bandedHammingPairs]]) — catches re-encoded /
    * mildly-edited copies whose hashes differ in ≤ `maxDist` bits,
    * where the exact-group [[dedupByDHash]] only sees identical
    * hashes. Exact at maxDist ≤ 3 by the 4×16 pigeonhole; never
    * all-pairs.
    *
    * @return (id_a, id_b, hamming) with id_a < id_b
    */
  def dhashPairs(media: DataFrame, maxDist: Int = 3): DataFrame =
    graft.dedup.Dedup.bandedHammingPairs(
      imageDHash(media).select(col("media_id"), col("dhash")),
      "dhash", "media_id", maxDist)
}
