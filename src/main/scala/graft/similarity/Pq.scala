package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Similarity.dot

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search"): the embedding space splits into `m`
  * orthogonal subspaces, each with its own tiny k-means codebook; a
  * vector is stored as `m` small codes instead of `dim` floats —
  * 64-dim float32 → 4 bytes at (m=4, ksub≤256), a 64× memory cut.
  *
  * Search is ADC (asymmetric distance computation): the query stays
  * exact; per query a lookup table of `m × ksub` partial distances to
  * every codebook centroid is computed ONCE, and each candidate's
  * approximate squared L2 distance is just `m` table lookups + adds
  * over its codes.
  *
  * Scale shape: codebook training is Lloyd over each subspace — the
  * same bounded-centroid distributed passes as the IVF coarse
  * quantizer (centroids driver-side, ksub·m ≤ a few thousand doubles;
  * assignment is a codegen'd least-of-structs, no UDF). Encoding is a
  * pure scan-side map. At serving time the corpus-side state is ONLY
  * (id, m codes) — the memory-bandwidth term that dominates
  * billion-vector scans shrinks by the compression factor — and the
  * query-side LUT broadcast is k-bounded. PQ composes with the IVF
  * index (probe lists first, ADC-score within them); this operator is
  * the full-scan variant that exercises the codec itself.
  *
  * Determinism: seeding, Lloyd order and tie-breaks follow the IVF
  * conventions (smallest-id seeds, smallest-index tie-break), and the
  * ADC sum adds subspace partials in fixed 0..m−1 order, so the same
  * arithmetic reproduces in DuckDB; the distance is rounded 1e-6
  * in-query so rank ties resolve identically across engines.
  */
object Pq {

  /** Trained product codebooks: `codebooks(s)(j)` is centroid `j` of
    * subspace `s`; `codes` is (neighbor_id, code0..code{m-1}).
    */
  final case class PqIndex(codebooks: Array[Array[Array[Double]]], codes: DataFrame)

  private def subvec(v: Column, s: Int, dsub: Int): Column =
    slice(v, s * dsub + 1, dsub)

  /** argmin over `cents` of ||sv − c||² as a codegen'd least-of-structs
    * (−2·sv·c + ||c||² is rank-equivalent; ties → smallest index).
    */
  private def nearestCode(sv: Column, cents: Array[Array[Double]]): Column = {
    val scored = cents.zipWithIndex.map { case (cent, j) =>
      struct(
        (dot(sv, typedlit(cent.toSeq)) * -2.0 + lit(cent.map(x => x * x).sum)).as("s"),
        lit(j).as("j"))
    }
    if (scored.length == 1) lit(0) else least(scored: _*).getField("j")
  }

  /** Train per-subspace codebooks and encode the corpus.
    *
    * Training cost: 1 + iters distributed jobs total, independent of
    * m — every Lloyd iteration assigns and means ALL m subspaces in
    * ONE pass (explode to (s, j, subvector) rows, one (s, j)-keyed
    * aggregation with ≤ m·ksub output groups). The projected corpus is
    * persisted for the duration (releasable via [[graft.OpCache]]) so
    * the passes do not re-scan/re-cast the source each time.
    */
  def buildPqIndex(corpus: DataFrame, m: Int, ksub: Int, iters: Int = 2,
                   idCol: String = "vec_id", vecCol: String = "embedding"): PqIndex = {
    require(m > 0 && ksub > 0 && iters >= 0)
    val c = graft.OpCache.persist(corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("v")))
    val dim = c.select(size(col("v"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val dsub = dim / m

    // deterministic seeds: the ksub smallest-id vectors' subvectors
    // (TakeOrderedAndProject — a k-bounded collect, not a corpus scan)
    val seedRows = c.orderBy(col("neighbor_id")).limit(ksub)
      .select("v").collect().map(_.getSeq[Double](0).toArray)
    require(seedRows.nonEmpty, "empty corpus")

    val codebooks: Array[Array[Array[Double]]] = Array.tabulate(m) { s =>
      Array.tabulate(ksub) { j =>
        seedRows(math.min(j, seedRows.length - 1))
          .slice(s * dsub, (s + 1) * dsub)
      }
    }
    for (_ <- 1 to iters) {
      val assigns = array((0 until m).map { s =>
        struct(lit(s).as("s"),
          nearestCode(subvec(col("v"), s, dsub), codebooks(s)).as("j"),
          subvec(col("v"), s, dsub).as("sv"))
      }: _*)
      val means = c.select(explode(assigns).as("a"))
        .groupBy(col("a.s").as("s"), col("a.j").as("j"))
        .agg(array((0 until dsub).map(d =>
          avg(element_at(col("a.sv"), d + 1))): _*).as("mean_sv"))
        .collect()
      means.foreach { r =>
        codebooks(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray
      }
    }

    val codeCols = (0 until m).map(s =>
      nearestCode(subvec(col("v"), s, dsub), codebooks(s)).as(s"code$s"))
    // the codes table IS the index — persist it (releasable, OpCache)
    // so it is ENCODED ONCE. Left lazy, ProjectCollapse folds the
    // m·ksub-dot encode through the search's candidate join and
    // re-encodes every candidate PER QUERY PAIR (measured 6.7 s vs
    // 0.7 s on a 100k-pair scan). On-disk serving uses writeIvfPqIndex
    // and never re-encodes at all.
    PqIndex(codebooks,
      graft.OpCache.persist(c.select(col("neighbor_id") +: codeCols: _*)))
  }

  /** ADC search over an encoded corpus: per query one `m × ksub`
    * partial-distance LUT (||q_s − c_{s,j}||² minus the constant
    * ||q_s||², which cancels in ranking), then every candidate costs m
    * array lookups. Returns per-query ascending-distance top-k.
    *
    * @return (query_id, neighbor_id, adc_dist DOUBLE — rounded 1e-6,
    *   rank INT)
    */
  def pqSearch(index: PqIndex, queries: DataFrame, k: Int,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val m = index.codebooks.length
    val ksub = index.codebooks(0).length
    val dsub = index.codebooks(0)(0).length
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("q_vec"))
    // the per-query LUT: lut_s[j] = −2·q_s·c_{s,j} + ||c_{s,j}||²
    val lutCols = (0 until m).map { s =>
      array((0 until ksub).map { j =>
        val cent = index.codebooks(s)(j)
        dot(subvec(col("q_vec"), s, dsub), typedlit(cent.toSeq)) * -2.0 +
          lit(cent.map(x => x * x).sum)
      }: _*).as(s"lut$s")
    }
    // the persist is a CORRECTNESS-OF-COST boundary, not a cache nicety:
    // without it ProjectCollapse folds the LUT construction through the
    // broadcast into the per-pair projection, recomputing all m·ksub
    // dot products for EVERY candidate pair (measured 6.1 s vs 0.3 s on
    // a 100k-pair scan) — the table is Q × m·ksub doubles, trivially
    // small, and releasable via OpCache
    val qlut = graft.OpCache.persist(q.select(col("query_id") +: lutCols: _*))
    val adc = (0 until m).map(s =>
      element_at(col(s"lut$s"), col(s"code$s") + 1)).reduce(_ + _)
    index.codes.crossJoin(broadcast(qlut))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("adc_dist", round(adc, 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("adc_dist"), col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("adc_dist"),
        col("rank").cast("int").as("rank"))
  }

  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int, m: Int,
             ksub: Int, iters: Int = 2, idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame =
    pqSearch(buildPqIndex(corpus, m, ksub, iters, idCol, vecCol),
      queries, k, idCol, vecCol)

  /** The serving composition: IVF coarse lists for pruning + PQ codes
    * for compression. `entries` is (list, neighbor_id, code0..) — the
    * actual on-disk layout of a billion-vector index: per-list
    * partitions whose rows are a few bytes each.
    *
    * This is the non-residual variant (codes quantize the raw vectors,
    * not v − centroid): the codebooks stay list-independent, so one
    * LUT per query serves every probed list. FAISS's residual
    * encoding buys accuracy at the cost of per-list LUTs; at the
    * corpus sizes where that matters, swap `buildPqIndex`'s input for
    * the residuals and key the LUT by (list, code).
    */
  final case class IvfPqIndex(centroids: Array[Array[Double]],
                              codebooks: Array[Array[Array[Double]]],
                              entries: DataFrame,
                              residual: Boolean = false)

  /** @param residual encode `v − centroid(list)` instead of `v` (the
    *   FAISS-accurate variant): residual magnitudes are a fraction of
    *   vector magnitudes, so the same codebook budget quantizes much
    *   finer. Costs per-(query, probed-list) LUTs at search instead of
    *   one LUT per query — still Q·nprobe tiny rows.
    */
  def buildIvfPqIndex(corpus: DataFrame, nlists: Int, m: Int, ksub: Int,
                      itersIvf: Int = 2, itersPq: Int = 2,
                      residual: Boolean = false,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): IvfPqIndex = {
    val ivf = Similarity.buildIvfIndex(corpus, nlists, itersIvf, idCol, vecCol)
    if (!residual) {
      val pq = buildPqIndex(corpus, m, ksub, itersPq, idCol, vecCol)
      IvfPqIndex(ivf.centroids, pq.codebooks,
        ivf.assigned.select(col("list"), col("neighbor_id"))
          .join(pq.codes, "neighbor_id"))
    } else {
      val centArr = typedlit(ivf.centroids.map(_.toSeq).toSeq)
      val resid = ivf.assigned.select(col("list"), col("neighbor_id"),
        zip_with(col("c_vec"), element_at(centArr, col("list") + 1),
          (a, b) => a - b).as("embedding"))
      val pq = buildPqIndex(resid, m, ksub, itersPq, "neighbor_id", "embedding")
      IvfPqIndex(ivf.centroids, pq.codebooks,
        resid.select(col("list"), col("neighbor_id"))
          .join(pq.codes, "neighbor_id"), residual = true)
    }
  }

  /** Probe + ADC: rank the `nprobe` nearest coarse lists per query,
    * then ADC-score ONLY their entries. Candidate cost per query is
    * (corpus/nlists)·nprobe rows × m byte-lookups — the scan never
    * touches a float vector.
    */
  def ivfPqSearch(index: IvfPqIndex, queries: DataFrame, k: Int, nprobe: Int,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = index.entries.sparkSession
    import spark.implicits._
    val m = index.codebooks.length
    val ksub = index.codebooks(0).length
    val dsub = index.codebooks(0)(0).length
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("q_vec"))
    // probe-list ranking against the coarse centroids (IVF convention)
    val centDf = index.centroids.zipWithIndex
      .map { case (v, i) => (i, v.toSeq) }.toSeq.toDF("list", "cent")
    val qLists = q.crossJoin(broadcast(centDf))
      .withColumn("cd", dot(col("q_vec"), col("cent")) * -2.0
        + dot(col("cent"), col("cent")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cd"), col("list"))))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("list"))
    val lutCols = (0 until m).map { s =>
      array((0 until ksub).map { j =>
        val cent = index.codebooks(s)(j)
        dot(subvec(col("q_vec"), s, dsub), typedlit(cent.toSeq)) * -2.0 +
          lit(cent.map(x => x * x).sum)
      }: _*).as(s"lut$s")
    }
    val adc = (0 until m).map(s =>
      element_at(col(s"lut$s"), col(s"code$s") + 1)).reduce(_ + _)
    val candidates = if (!index.residual) {
      // one LUT per query serves every probed list (same ProjectCollapse
      // cost boundary as pqSearch's qlut)
      val qlut = graft.OpCache.persist(q.select(col("query_id") +: lutCols: _*))
      index.entries.join(broadcast(qLists), "list")
        .filter(col("neighbor_id") =!= col("query_id"))
        .join(broadcast(qlut), "query_id")
    } else {
      // residual codes: the LUT is per (query, probed list) — built on
      // the RESIDUAL query q − centroid(list), Q·nprobe tiny rows.
      // ADC then approximates ||(q − cent) − c_code||², whose ranking
      // equals ||q − (cent + c_code)||² — the true reconstruction.
      val qr = qLists.join(q, "query_id")
        .join(broadcast(centDf), "list")
        .select(col("query_id"), col("list"),
          zip_with(col("q_vec"), col("cent"), (a, b) => a - b).as("q_vec"))
      val qrlut = graft.OpCache.persist(
        qr.select(col("query_id") +: col("list") +: lutCols: _*))
      index.entries.join(broadcast(qrlut), Seq("list"))
        .filter(col("neighbor_id") =!= col("query_id"))
    }
    candidates
      .withColumn("adc_dist", round(adc, 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("adc_dist"), col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("adc_dist"),
        col("rank").cast("int").as("rank"))
  }

  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int, nlists: Int,
                nprobe: Int, m: Int, ksub: Int, itersIvf: Int = 2,
                itersPq: Int = 2, residual: Boolean = false,
                idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame =
    ivfPqSearch(buildIvfPqIndex(corpus, nlists, m, ksub, itersIvf, itersPq,
      residual, idCol, vecCol), queries, k, nprobe, idCol, vecCol)

  /** Persist an IVF-PQ index: entries partitioned by coarse list (a
    * probe of nprobe lists prunes to those directories at planning
    * time), coarse centroids and codebooks as tiny side tables —
    * train once, serve from the compressed layout forever.
    */
  def writeIvfPqIndex(index: IvfPqIndex, path: String): Unit = {
    val spark = index.entries.sparkSession
    import spark.implicits._
    index.entries.write.mode("overwrite")
      .partitionBy("list").parquet(s"$path/entries")
    index.centroids.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq
      .toDF("list", "cent").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
    (for {
      s <- index.codebooks.indices
      j <- index.codebooks(s).indices
    } yield (s, j, index.codebooks(s)(j).toSeq)).toDF("s", "j", "cent")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
    Seq(Tuple1(index.residual)).toDF("residual").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  def readIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
                     path: String): IvfPqIndex = {
    val cents = spark.read.parquet(s"$path/centroids")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).map(_._2)
    val cbRows = spark.read.parquet(s"$path/codebooks")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val m = cbRows.map(_._1).max + 1
    val codebooks = Array.tabulate(m) { s =>
      cbRows.filter(_._1 == s).sortBy(_._2).map(_._3)
    }
    val entries = spark.read.parquet(s"$path/entries")
    val codeCols = entries.columns.filter(_.startsWith("code")).sorted
    // absent meta (pre-residual layout) means non-residual codes.
    // Resolve existence through the Hadoop FileSystem of the path —
    // java.io.File would report false on HDFS/S3 even when meta exists,
    // silently reading a residual index as raw (the Packing
    // compactPartitions pattern).
    val metaPath = new org.apache.hadoop.fs.Path(s"$path/meta")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val residual =
      if (fs.exists(metaPath))
        spark.read.parquet(s"$path/meta").head().getBoolean(0)
      else false
    IvfPqIndex(cents, codebooks,
      entries.select(col("neighbor_id") +: col("list").cast("int").as("list") +:
        codeCols.map(c => col(c).cast("int").as(c)): _*), residual)
  }
}
