package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  *
  * Brute-force cosine top-k is the exactness baseline (broadcast the
  * query set, score every corpus vector, per-query top-k window);
  * sign-LSH bucketing is the scale path (bucket on hyperplane sign
  * bits, search within buckets only — the corpus-side shuffle is on
  * bucket keys, never an all-pairs product).
  *
  * The dot product is a codegen'd `aggregate(zip_with(...))` fold over
  * doubles — element order is left-to-right, so the identical SQL
  * (DuckDB list_dot_product) reproduces it bit-for-bit.
  */
object Similarity {

  /** Σ aᵢ·bᵢ — a native codegen'd Catalyst expression
    * (graft.functions.DotProduct): same left-to-right fold as the
    * higher-order `aggregate(zip_with(...))` formulation but without the
    * per-row intermediate array or the codegen break HOFs cause.
    */
  def dot(a: Column, b: Column): Column = graft.functions.DotProduct.dot(a, b)

  /** The HOF formulation, kept for cross-checking the native expression. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine with a zero-vector guard (0 by convention): ANSI-mode Spark
    * would throw on the zero-norm division otherwise.
    */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0.0, 0.0).otherwise(dot(a, b) / denom)
  }

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Embedding-space outlier detection — the curation pass that drops
    * mislabeled / off-distribution vectors before they poison a
    * training mix: each vector's L2 distance to its OWN label's
    * centroid, z-scored against that label's distance distribution;
    * `outlier = z > zThresh`.
    *
    * Scale shape: the (vec, dim) explode feeds a map-side-combinable
    * (label, dim) hash aggregate (centroid table is labels × dims —
    * tiny, broadcast back); the distance reduces per vector with no
    * products; the per-label stats ride ONE label-partitioned window.
    * Nothing is quadratic and the corpus is never broadcast.
    *
    * Determinism: centroid coordinates, distances, and the per-label
    * mean/σ are all rounded 1e-9 before downstream arithmetic (the
    * cusum discipline), the squared deviation is an explicit multiply
    * (never pow, whose engine implementations differ), and the outlier
    * flag compares a 1e-6-rounded margin.
    *
    * @return (vec_id, label, dist, z, outlier INT)
    */
  def centroidOutliers(embeds: DataFrame, zThresh: Double = 2.0): DataFrame = {
    // Every aggregated quantity is fixed to exact integers BEFORE
    // aggregation (coordinates and distances in 1e-9 units, sums on
    // DECIMAL(38,0)) so no result depends on float accumulation order —
    // the q_cusum lesson: 1e-9-rounding AFTER an unordered double sum
    // still flips at boundary values when the partition layout shifts.
    // z reduces to (n·x − S) / √(n·Q − S²) over the exact sums.
    val dec = "decimal(38,0)"
    val e = embeds.select(col("vec_id"), col("label"),
      asDouble(col("embedding")).as("v"))
    val x = e.select(col("vec_id"), col("label"),
        posexplode(col("v")).as(Seq("pos", "val")))
      .withColumn("val_i", round(col("val") * 1e9).cast("long"))
    val cent = x.groupBy("label", "pos")
      .agg(round(sum(col("val_i").cast(dec)).cast("double") / count(lit(1)))
        .cast("long").as("cv_i"))
    val d = x.join(broadcast(cent), Seq("label", "pos"))
      .withColumn("diff", (col("val_i") - col("cv_i")).cast(dec))
      .groupBy("vec_id", "label")
      .agg(round(sqrt(sum(col("diff") * col("diff")).cast("double")))
        .cast("long").as("dist_i"))
    val wl = Window.partitionBy("label")
    val n = count(lit(1)).over(wl).cast(dec)
    val s = sum(col("dist_i").cast(dec)).over(wl)
    val q = sum(col("dist_i").cast(dec) * col("dist_i")).over(wl)
    val num = (n * col("dist_i") - s).cast("double")
    val den = sqrt((n * q - s * s).cast("double"))
    val z = when(den === 0.0, 0.0).otherwise(num / den)
    d.select(col("vec_id"), col("label"),
      round(col("dist_i") / 1e9, 6).as("dist"), round(z, 6).as("z"),
      (round(z - zThresh, 6) > 0.0).cast("int").as("outlier"))
  }

  /** Shared ranking tail: per-query top-k by cosine with deterministic
    * neighbour-id tie-break. Expects columns query_id/neighbor_id/cosine.
    */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"),
        col("rank").cast("int").as("rank"))

  /** Exact cosine top-k: for each query vector (`queries`), the k
    * most-similar corpus vectors (excluding itself), deterministically
    * tie-broken by corpus id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("q_vec")))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("c_vec"))
    rankTopK(c.crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("q_vec"), col("c_vec"))), k)
  }

  /** Embedding-cosine near-duplicate pairs: all (a < b) pairs of a
    * bounded corpus with cosine >= threshold — the exact-verification
    * path of embedding dedup. For an unbounded corpus, pre-block with
    * `signBucket` (lshTopK's bucketing) and verify candidates here.
    */
  def cosineNearDupPairs(corpus: DataFrame, threshold: Double,
                         idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = corpus.select(col(idCol).as("id_a"), asDouble(col(vecCol)).as("va"))
    val b = corpus.select(col(idCol).as("id_b"), asDouble(col(vecCol)).as("vb"))
    a.crossJoin(broadcast(b))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Scale-path near-duplicate pairs: candidates blocked on the sign-LSH
    * bucket (a pair must share the bucket — vectors with cosine near 1
    * almost surely agree on every coordinate sign), verified exactly by
    * cosine. The self-join shuffles on bucket keys only, so corpus size
    * scales out; recall < 1 by design (sign-boundary pairs are missed),
    * like any LSH blocking.
    */
  def lshNearDupPairs(corpus: DataFrame, threshold: Double, dims: Seq[Int],
                      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = corpus.select(col(idCol).as("id_a"), asDouble(col(vecCol)).as("va"),
      signBucket(asDouble(col(vecCol)), dims).as("bucket"))
    val b = corpus.select(col(idCol).as("id_b"), asDouble(col(vecCol)).as("vb"),
      signBucket(asDouble(col(vecCol)), dims).as("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** IVF (inverted-file) index: a deterministic k-means coarse
    * quantizer — centroids seeded from evenly-spaced corpus vectors,
    * refined by `iters` Lloyd steps (each one aggregation over the
    * corpus) — then each vector assigned to its nearest centroid's
    * list. Queries probe the `nprobe` nearest centroid lists only, so
    * the scored candidate set shrinks by ~nlists/nprobe; like any ANN
    * index, recall < 1 by design.
    *
    * Deterministic end-to-end: seeding, Lloyd order, and assignment
    * tie-breaks are all fixed, so results are reproducible across runs
    * and engines.
    */
  /** A built IVF index: the trained coarse quantizer plus the
    * list-assigned corpus. `assigned` is (list, neighbor_id, c_vec) —
    * persist it (or [[writeIvfIndex]] it, partitioned by list) to
    * train once and search many times.
    */
  final case class IvfIndex(centroids: Array[Array[Double]], assigned: DataFrame)

  /** Argmin over centroids of squared euclidean distance to `c_vec`,
    * as a codegen'd least-of-structs over the native DotProduct:
    * ||v−c||² = ||v||² − 2·v·c + ||c||² and ||v||² is constant per
    * row, so −2·v·c + ||c||² (with ||c||² a driver-side constant) is
    * rank-equivalent; the struct's second field breaks ties on the
    * smallest list index. No UDF — the whole ANN path stays inside
    * whole-stage codegen.
    */
  private def nearestCentroidOf(cents: Array[Array[Double]]): Column = {
    val scored = cents.zipWithIndex.map { case (cent, i) =>
      struct(
        (dot(col("c_vec"), typedlit(cent.toSeq)) * -2.0 +
          lit(cent.map(x => x * x).sum)).as("s"),
        lit(i).as("i"))
    }
    // least() needs >= 2 args; a single-list quantizer is the
    // degenerate everything-in-list-0 case
    if (scored.length == 1) lit(0)
    else least(scored: _*).getField("i")
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nlists: Int, nprobe: Int, iters: Int = 3,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    ivfSearch(buildIvfIndex(corpus, nlists, iters, idCol, vecCol),
      queries, k, nprobe, idCol, vecCol)

  /** Quantizer health audit — per-list population and mean distance to
    * centroid: the serving diagnostics an IVF deployment watches (an
    * empty or mega list ⇒ reseed/rebalance; mean-distance drift ⇒ the
    * corpus moved and the quantizer needs retraining). One broadcast
    * join of the assignment against the nlists-row centroid table;
    * distances are row-local folds and the per-list means ride exact
    * 1e-9-unit integer sums (layout-proof).
    *
    * @return (list, n_vecs, share, mean_dist)
    */
  def ivfStats(corpus: DataFrame, nlists: Int = 16, iters: Int = 3,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val idx = buildIvfIndex(corpus, nlists, iters, idCol, vecCol)
    val spark = idx.assigned.sparkSession
    import spark.implicits._
    val centDf = idx.centroids.zipWithIndex
      .map { case (v, i) => (i, v.toSeq) }.toSeq.toDF("list", "cent")
    val di = idx.assigned.join(broadcast(centDf), "list")
      .withColumn("__d2",
        dot(col("c_vec"), col("c_vec"))
          - lit(2.0) * dot(col("c_vec"), col("cent"))
          + dot(col("cent"), col("cent")))
      .withColumn("__di",
        round(sqrt(greatest(col("__d2"), lit(0.0))) * 1e9).cast("long"))
    val perList = di.groupBy(col("list").cast("int").as("list"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("__di")).as("__s"))
    // nlists rows from here on — the constant-key window is bounded
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(graft.plans.PlanLint.kBoundedKey(col("list")))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    perList
      .withColumn("__tot", sum(col("n_vecs")).over(w))
      .select(col("list"), col("n_vecs"),
        round(col("n_vecs").cast("double") / col("__tot"), 6).as("share"),
        round(col("__s").cast("double") / col("n_vecs") / 1e9, 6)
          .as("mean_dist"))
  }

  /** ANN quality as a GATE ROW (the vocab-sketch envelope discipline):
    * per query, the exact brute-force top-k mean cosine plus a verdict
    * that IVF recall@k against that same in-plan brute result clears
    * `bound`. The oracle reproduces the exact columns and answers TRUE
    * for the verdict — so an IVF quality regression (quantizer drift,
    * probe bug, list corruption) hash-mismatches the correctness gate
    * instead of living only in specs. Cost is one bounded brute pass
    * over the query set — a recall AUDIT you run on a query sample, not
    * the serving path.
    *
    * @return (query_id, brute_mean_cosine, recall_ok)
    */
  def ivfRecall(corpus: DataFrame, queries: DataFrame, k: Int,
                nlists: Int, nprobe: Int, bound: Double, iters: Int = 3,
                idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame =
    annRecall(corpus, queries,
      ivfTopK(corpus, queries, k, nlists, nprobe, iters, idCol, vecCol),
      k, bound, idCol, vecCol)

  /** The generic recall gate behind [[ivfRecall]]: any ANN result
    * frame with (query_id, neighbor_id) rows audits against an
    * in-plan brute pass over the same queries — one gate shape for
    * IVF, PQ, IVF-PQ, LSH.
    */
  def annRecall(corpus: DataFrame, queries: DataFrame, approx: DataFrame,
                k: Int, bound: Double, idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    val brute = bruteForceTopK(corpus, queries, k, idCol, vecCol)
    val a = approx.select(col("query_id").as("__q"),
      col("neighbor_id").as("__n"), lit(1L).as("__hit"))
    brute
      .join(a, col("query_id") === col("__q") &&
        col("neighbor_id") === col("__n"), "left")
      .groupBy(col("query_id"))
      // cosines are row-local (deterministic); the MEAN is integer-fixed
      // before summation so the 1e-6 rounding cannot flip with layout
      .agg(round(sum(round(col("cosine") * 1e9).cast("long"))
          / count(lit(1)) / 1e9, 6).as("brute_mean_cosine"),
        (sum(coalesce(col("__hit"), lit(0L))) >=
          count(lit(1)) * bound).as("recall_ok"))
  }

  /** Aggregate-level recall gate — ONE row over the whole query set:
    * (n_queries, global brute mean cosine, micro-recall ≥ bound).
    * For coarse quantizers (PQ at small m·log₂ksub bits) per-query
    * recall legitimately touches 0 on unclustered data, so the
    * per-query [[annRecall]] verdict would flap; the corpus-level
    * micro-average is the statistic that stays deterministic and
    * still collapses under real corruption (wrong LUT, garbled codes
    * → recall ≈ k/corpus).
    */
  def annRecallSummary(corpus: DataFrame, queries: DataFrame,
                       approx: DataFrame, k: Int, bound: Double,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    val brute = bruteForceTopK(corpus, queries, k, idCol, vecCol)
    val a = approx.select(col("query_id").as("__q"),
      col("neighbor_id").as("__n"), lit(1L).as("__hit"))
    brute
      .join(a, col("query_id") === col("__q") &&
        col("neighbor_id") === col("__n"), "left")
      .agg(countDistinct(col("query_id")).as("n_queries"),
        round(sum(round(col("cosine") * 1e9).cast("long"))
          / count(lit(1)) / 1e9, 6).as("brute_mean_cosine"),
        (sum(coalesce(col("__hit"), lit(0L))) >=
          count(lit(1)) * bound).as("recall_ok"))
  }

  /** Train the quantizer and assign every corpus vector to its list —
    * the expensive phase, done once per corpus version.
    */
  def buildIvfIndex(corpus: DataFrame, nlists: Int, iters: Int = 3,
                    idCol: String = "vec_id", vecCol: String = "embedding"): IvfIndex = {
    // persisted (releasable, OpCache) — each Lloyd pass and the final
    // assignment would otherwise re-scan and re-cast the source
    val c = graft.OpCache.persist(corpus.select(
      col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("c_vec")))

    // deterministic seeding: the nlists smallest-id corpus vectors via
    // a distributed TakeOrderedAndProject (per-partition top-k + merge —
    // no global-sort window, no full-corpus collect); Lloyd iterations
    // spread the centroids from there
    val seedRows = c.orderBy(col("neighbor_id")).limit(nlists)
      .select("c_vec").collect()
    require(seedRows.nonEmpty, "empty corpus")
    var centroids: Array[Array[Double]] =
      (0 until nlists).map(i =>
        seedRows(math.min(i, seedRows.length - 1)).getSeq[Double](0).toArray).toArray

    // Lloyd iterations: assignment + mean, each one distributed pass
    for (_ <- 1 to iters) {
      val means = c.withColumn("list", nearestCentroidOf(centroids))
        .groupBy("list")
        .agg(array((0 until centroids(0).length).map(j =>
          avg(element_at(col("c_vec"), j + 1))): _*).as("mean_vec"))
        .collect()
      val next = centroids.clone()
      means.foreach { r =>
        next(r.getInt(0)) = r.getSeq[Double](1).toArray
      }
      centroids = next
    }

    IvfIndex(centroids, c.withColumn("list", nearestCentroidOf(centroids)))
  }

  /** Probe phase: score each query against the `nprobe` nearest
    * centroid lists only. Over an index read back from
    * [[writeIvfIndex]]'s list-partitioned layout, the probe-list join
    * keys are partition keys — "read these nprobe lists" becomes a
    * planning-time partition filter.
    */
  def ivfSearch(index: IvfIndex, queries: DataFrame, k: Int, nprobe: Int,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = index.assigned.sparkSession
    import spark.implicits._
    val centroids = index.centroids
    val assigned = index.assigned

    // queries probe the nprobe nearest centroid lists
    val centDf = centroids.zipWithIndex
      .map { case (v, i) => (i, v.toSeq) }.toSeq.toDF("list", "cent")
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("q_vec"))
    val qLists = q.crossJoin(broadcast(centDf))
      .withColumn("cd", dot(col("q_vec"), col("cent")) * -2.0
        + dot(col("cent"), col("cent")))  // ||q-c||² − ||q||² (rank-equivalent)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cd"), col("list"))))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("q_vec"), col("list"))

    rankTopK(assigned.join(broadcast(qLists), "list")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("q_vec"), col("c_vec"))), k)
  }

  /** Persist an index: assignments as parquet PARTITIONED BY list (a
    * probe of nprobe lists prunes to those directories at planning
    * time) plus the centroid table.
    */
  def writeIvfIndex(index: IvfIndex, path: String): Unit = {
    val spark = index.assigned.sparkSession
    import spark.implicits._
    index.assigned.write.mode("overwrite")
      .partitionBy("list").parquet(s"$path/lists")
    index.centroids.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq
      .toDF("list", "cent").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
  }

  def readIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String): IvfIndex = {
    val cents = spark.read.parquet(s"$path/centroids")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).map(_._2)
    IvfIndex(cents,
      spark.read.parquet(s"$path/lists")
        .select(col("list").cast("int").as("list"),
          col("neighbor_id"), col("c_vec")))
  }

  /** Incremental index maintenance: assign a NEW batch of vectors to
    * the existing trained quantizer and extend the index — no
    * retraining, no touch of the already-indexed corpus. The
    * steady-state ingest path: train once on a representative sample,
    * then append shard after shard; centroids drift only when you
    * choose to rebuild.
    */
  def ivfAppend(index: IvfIndex, batch: DataFrame,
                idCol: String = "vec_id", vecCol: String = "embedding"): IvfIndex = {
    val b = batch.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("c_vec"))
    IvfIndex(index.centroids,
      index.assigned.unionByName(
        b.withColumn("list", nearestCentroidOf(index.centroids))))
  }

  /** Append a batch to an ON-DISK index written by [[writeIvfIndex]]:
    * assignments land as new files inside the existing list=...
    * partition directories (dynamic partition append — only the
    * touched lists gain files; nothing is rewritten).
    */
  def appendIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                     batch: DataFrame,
                     idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val cents = spark.read.parquet(s"$path/centroids")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).map(_._2)
    batch.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("c_vec"))
      .withColumn("list", nearestCentroidOf(cents))
      .write.mode("append").partitionBy("list").parquet(s"$path/lists")
  }

  /** Hard-negative mining for contrastive training (the DPR/Contriever
    * recipe): for each query vector, the k most-similar corpus vectors
    * whose `labelCol` DIFFERS from the query's — near-misses that teach
    * a retriever the decision boundary, where random negatives teach
    * nothing. Same plan shape as bruteForceTopK (corpus streams against
    * the broadcast query set; for unbounded corpora compose with the
    * IVF/PQ probe path first), the label inequality rides the join
    * filter.
    *
    * @return (query_id, neighbor_id, cosine, rank)
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
                    labelCol: String = "label", idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("q_vec"), col(labelCol).as("__ql")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("c_vec"), col(labelCol).as("__cl"))
    rankTopK(c.crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id") &&
        col("__cl") =!= col("__ql"))
      .withColumn("cosine", cosine(col("q_vec"), col("c_vec"))), k)
  }

  /** L2-normalize the embedding column in place (zero vectors pass
    * through): after this, inner product ≡ cosine, so the quantized /
    * PQ MIPS paths rank by cosine directly. Pure scan-side transform.
    */
  def l2Normalize(df: DataFrame, vecCol: String = "embedding"): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    // the norm lands in a projected column first — referencing it
    // inside the lambda would re-fold the dot product per ELEMENT
    df.withColumn("__n", norm(v))
      .withColumn(vecCol,
        when(col("__n") === 0.0, v).otherwise(transform(v, x => x / col("__n"))))
      .drop("__n")
  }

  /** Matryoshka-style truncation (Kusupati et al. 2022): keep the
    * first `d` dimensions and re-normalize — the standard
    * cost/quality dial for MRL-trained embedding models (a 4× dim cut
    * is a 4× scan-bandwidth cut at serving). Scan-side only.
    */
  def truncateDims(df: DataFrame, d: Int, vecCol: String = "embedding"): DataFrame = {
    require(d > 0, s"d must be positive, got $d")
    val t = slice(col(vecCol).cast("array<double>"), 1, d)
    df.withColumn("__t", t).withColumn("__n", norm(col("__t")))
      .withColumn(vecCol,
        when(col("__n") === 0.0, col("__t"))
          .otherwise(transform(col("__t"), x => x / col("__n"))))
      .drop("__t", "__n")
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the corpus with the IVF coarse
    * quantizer, then prune near-duplicates WITHIN each cluster only —
    * a vector is dropped when some lower-id vector in its cluster has
    * cosine ≥ `threshold` (the deterministic keep-the-lowest-id
    * convention every dedup operator here shares). Clustering bounds
    * the candidate set: the quadratic verification runs per cluster
    * (corpus/nlists sized), never corpus-wide — scale nlists with the
    * corpus to keep clusters bounded. Cross-cluster near-dups are
    * missed by design, exactly the SemDeDup trade.
    *
    * @return survivors as (idCol, list INT) — cluster id retained for
    *   downstream diversity sampling
    */
  def semanticDedup(corpus: DataFrame, threshold: Double, nlists: Int,
                    iters: Int = 3, idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val a = buildIvfIndex(corpus, nlists, iters, idCol, vecCol).assigned
    val left = a.select(col("list"), col("neighbor_id").as("id_a"),
      col("c_vec").as("va"))
    val right = a.select(col("list"), col("neighbor_id").as("id_b"),
      col("c_vec").as("vb"))
    // within-cluster pairs only: the join shuffles on the cluster key,
    // so corpus size scales out horizontally across clusters
    val dropped = left.join(right, Seq("list"))
      .filter(col("id_a") < col("id_b"))
      .filter(cosine(col("va"), col("vb")) >= threshold)
      .select(col("id_b")).distinct()
    a.join(dropped, a("neighbor_id") === dropped("id_b"), "left_anti")
      .select(col("neighbor_id").as(idCol), col("list"))
  }

  /** Cluster-diverse subset selection: at most `perCluster` vectors
    * per IVF cluster, chosen by deterministic hash rank within the
    * cluster — the diversity-preserving downsampling step of a
    * training-data pipeline (cap any semantic neighbourhood's share of
    * the corpus instead of sampling blind). Composes the IVF coarse
    * quantizer with the stratified top-k sampler, so the only wide
    * operation is a per-cluster bounded rank window.
    *
    * @return (idCol, list INT) — the kept vectors with their cluster
    */
  def diverseSample(corpus: DataFrame, perCluster: Int, nlists: Int,
                    salt: String, iters: Int = 3, idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val a = buildIvfIndex(corpus, nlists, iters, idCol, vecCol).assigned
      .select(col("neighbor_id").as(idCol), col("list"))
    graft.sampling.Sampling.hashTopKPerStratum(a, idCol, "list", perCluster, salt)
  }

  /** Sign-LSH bucket key: one bit per hyperplane — here the sign of the
    * coordinate at each given dimension index (axis-aligned hyperplanes;
    * any fixed projection family works the same way).
    */
  def signBucket(vec: Column, dims: Seq[Int]): Column =
    concat(dims.map(d =>
      when(element_at(vec, d + 1) >= 0, "1").otherwise("0")): _*)

  /** Approximate top-k: candidates limited to the query's sign bucket.
    * Recall < 1 by design; the bucket join shuffles on the bucket key
    * only, so corpus size scales out horizontally.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dims: Seq[Int],
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("q_vec"),
      signBucket(asDouble(col(vecCol)), dims).as("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("c_vec"),
      signBucket(asDouble(col(vecCol)), dims).as("bucket"))
    rankTopK(c.join(broadcast(q), "bucket")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("q_vec"), col("c_vec"))), k)
  }

  /** Symmetric int8 scalar quantization of an embedding column: per
    * vector, scale = max|x|/127 (1.0 for the zero vector) and
    * q_i = floor(x_i/scale + 0.5) ∈ [−127, 127].
    *
    * The serving-memory lever at corpus scale: 4 bytes/dim → 1, so a
    * 10⁹×768-dim float corpus (~3 TB) fits the same executors at
    * ~0.75 TB, and the int dot products are exact in doubles (|q·q| ≤
    * 127²·dims ≪ 2⁵³) — no accumulation-order sensitivity.
    *
    * Portability-by-construction (like the md5-string hashes):
    * `floor(x + 0.5)` is the same expression in any engine, with none
    * of the round()-mode ambiguity (HALF_UP vs banker's) across
    * engines.
    *
    * @return (idCol, scale DOUBLE, qvec ARRAY<INT>)
    */
  def quantize(emb: DataFrame, idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame =
    emb.select(col(idCol), asDouble(col(vecCol)).as("__v"))
      .withColumn("scale", {
        val m = array_max(transform(col("__v"), x => abs(x)))
        when(m === 0.0, 1.0).otherwise(m / 127.0)
      })
      .withColumn("qvec",
        transform(col("__v"), x => floor(x / col("scale") + lit(0.5)).cast("int")))
      .drop("__v")

  /** The ±1 Johnson–Lindenstrauss projection matrix as a pure function
    * of (inDim, outDim, salt): sign(j, i) is the parity of the first
    * md5 byte of "salt:j:i" — computed once in the driver, inlined as
    * literals in the plan, and reproducible by any engine (the oracle
    * builder calls this same function).
    */
  def rpSigns(inDim: Int, outDim: Int, salt: String): Seq[Seq[Int]] =
    (0 until outDim).map { j =>
      (0 until inDim).map { i =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$salt:$j:$i".getBytes("UTF-8"))
        if ((h(0) & 1) == 0) 1 else -1
      }
    }

  /** Johnson–Lindenstrauss random projection (Achlioptas ±1 variant):
    * compress embeddings from inDim to outDim with
    * y_j = ⟨v, s_j⟩ / √outDim — the cheap pre-ANN dimensionality cut
    * (pairwise distances survive within (1 ± ε) w.h.p. at
    * outDim ≈ 8·ln n / ε²). The sign matrix is deterministic (see
    * [[rpSigns]]), each output component is ONE left-to-right dot
    * fold, and components round to 1e-6 — so the projection is
    * engine-exact, scan-local, and shuffle-free: at 100 TB this is a
    * map-only 4× (64→16) byte cut applied before any index build.
    *
    * The sign matrix rides a BROADCAST variable inside a codegen'd
    * expression ([[graft.functions.MatVecProject]]) rather than
    * outDim × inDim plan literals: the plan stays O(1) in the
    * projection size (no "large task binary" cliff when outDim grows),
    * while the arithmetic — the same fold, the same ·1/√outDim, the
    * same round-6 — is bit-identical to the literal formulation the
    * oracle replays (pinned by SimilaritySpec).
    *
    * @return (idCol, proj ARRAY<DOUBLE>)
    */
  def randomProject(emb: DataFrame, outDim: Int, salt: String = "rp",
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    require(outDim >= 1, s"outDim must be >= 1, got $outDim")
    val inDim = emb.select(size(col(vecCol)).as("__d")).head().getInt(0)
    val signs = rpSigns(inDim, outDim, salt)
    val invSqrt = 1.0 / math.sqrt(outDim.toDouble)
    val v = asDouble(col(vecCol))
    emb.select(col(idCol),
      graft.functions.MatVecProject.project(emb.sparkSession, v,
        signs.map(_.map(_.toDouble)), invSqrt, 6).as("proj"))
  }

  /** JL distortion gate: over the deterministic pair sample
    * (a < b, both id < maxId), the worst and mean absolute cosine
    * error between the original and the projected space, with an
    * envelope verdict — the quantileSketchGate discipline applied to
    * the projection: drift in either the sign matrix or the fold
    * arithmetic hash-mismatches this row before it silently degrades
    * ANN recall downstream.
    *
    * @return one row (n_pairs, max_err, mean_err, ok)
    */
  def randomProjectGate(emb: DataFrame, outDim: Int, maxId: Long,
                        envelope: Double, salt: String = "rp",
                        idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame = {
    val sample = emb.filter(col(idCol) < maxId)
    val proj = randomProject(sample, outDim, salt, idCol, vecCol)
    val o = sample.select(col(idCol), asDouble(col(vecCol)).as("__v"))
      .join(proj, idCol)
    val a = o.select(col(idCol).as("__ia"), col("__v").as("__va"),
      col("proj").as("__pa"))
    val b = o.select(col(idCol).as("__ib"), col("__v").as("__vb"),
      col("proj").as("__pb"))
    val err9 = round(abs(cosine(col("__va"), col("__vb")) -
      cosine(col("__pa"), col("__pb"))) * 1e9).cast("long")
    // the pair sample is maxId-bounded by contract — broadcast one side
    // so the inequality join stays a bounded BNLJ (without the hint the
    // projected side's unknown size estimate lets the planner fall back
    // to a CartesianProduct, which the lint sweep rightly flags)
    a.join(broadcast(b), col("__ia") < col("__ib"))
      .select(err9.as("__e9"))
      .agg(count(lit(1)).as("n_pairs"),
        round(max(col("__e9")).cast("double") / 1e9, 6).as("max_err"),
        round((sum(col("__e9")).cast("double") / count(lit(1))) / 1e9, 6)
          .as("mean_err"))
      .select(col("n_pairs"), col("max_err"), col("mean_err"),
        (col("max_err") < envelope).as("ok"))
  }

  /** Approximate max-inner-product top-k over the QUANTIZED corpus:
    * score = scale_q·scale_c·(q̂·ĉ), ranked per query with the same
    * deterministic neighbour-id tie-break as the exact path. This is
    * the int8 re-rank/serving shape: the float corpus never loads, and
    * the integer dot is exact, so results are reproducible bit-for-bit
    * across engines (the oracle mirrors the identical arithmetic).
    *
    * @return (query_id, neighbor_id, score, rank)
    */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(quantize(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"), col("scale").as("__qs"),
        col("qvec").cast("array<double>").as("__qq")))
    val c = quantize(corpus, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col("scale").as("__cs"),
        col("qvec").cast("array<double>").as("__cq"))
    c.crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("score",
        col("__qs") * col("__cs") * dot(col("__qq"), col("__cq")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("score"),
        col("rank").cast("int").as("rank"))
  }

  /** Per-query retrieval-quality metrics of ANY approximate top-k
    * result against the exact brute-force ground truth — the ranking
    * companion of [[annRecallSummary]]'s aggregate gate: recall@k, MRR
    * (reciprocal rank of the true #1 inside the approximate list) and
    * NDCG@k with graded relevance rel = k+1 − brute_rank (the ideal
    * list in brute order scores 1.0).
    *
    * Determinism: both rankings are deterministically tie-broken
    * upstream; every per-item term (rel/log₂(rank+1), 1/rank) is fixed
    * to 1e-9 integers before its per-query sum, and the ideal DCG is a
    * driver-computed constant over the SAME fixed terms — no float
    * accumulates across rows, so the metrics are layout- and
    * engine-exact. One row per query; averaging is left to the reader
    * so no cross-query float summation exists either.
    *
    * @param approx (query_id, neighbor_id, rank) — rank 1-based
    * @return (query_id, hits, recall, rr, dcg, ndcg)
    */
  def retrievalEval(corpus: DataFrame, queries: DataFrame,
                    approx: DataFrame, k: Int,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val brute = bruteForceTopK(corpus, queries, k, idCol, vecCol)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").as("__brank"))
    val a = approx.select(col("query_id"), col("neighbor_id"),
      col("rank").as("__arank"))
    val rel = coalesce(lit(k + 1) - col("__brank"), lit(0))
    val dcg9 = round(rel.cast("double") /
      log2(col("__arank").cast("double") + 1.0) * 1e9).cast("long")
    val rr9 = when(col("__brank") === 1,
      round(lit(1e9) / col("__arank")).cast("long")).otherwise(lit(0L))
    val idcg9: Long = (1 to k).map(i =>
      math.round((k + 1 - i).toDouble /
        (math.log(i + 1.0) / math.log(2.0)) * 1e9)).sum
    a.join(brute, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(sum(when(col("__brank").isNotNull, 1L).otherwise(0L)).as("hits"),
        max(rr9).as("__rr9"), sum(dcg9).as("__dcg9"))
      .select(col("query_id"), col("hits"),
        round(col("hits") / k, 6).as("recall"),
        round(col("__rr9") / 1e9, 6).as("rr"),
        round(col("__dcg9") / 1e9, 6).as("dcg"),
        round(col("__dcg9").cast("double") / idcg9, 6).as("ndcg"))
  }

  /** k-nearest-neighbor majority-vote classification — the standard
    * label-quality / embedding-quality probe (a good embedding space
    * classifies by neighborhood): per query, the exact top-k corpus
    * neighbors vote by label; majority wins, ties break to the
    * smallest label; `correct` compares against the query's own label.
    * Vote counts are integers and the argmax is a lexicographic
    * struct-max — fully deterministic.
    *
    * @return (query_id, true_label, pred_label, votes, correct)
    */
  def knnClassify(corpus: DataFrame, queries: DataFrame, k: Int,
                  idCol: String = "vec_id", vecCol: String = "embedding",
                  labelCol: String = "label"): DataFrame = {
    val nn = bruteForceTopK(corpus, queries, k, idCol, vecCol)
    val lbl = corpus.select(col(idCol).as("neighbor_id"),
      col(labelCol).cast("long").as("__nl"))
    val truth = queries.select(col(idCol).as("query_id"),
      col(labelCol).cast("long").as("true_label"))
    nn.join(lbl, "neighbor_id")
      .groupBy(col("query_id"), col("__nl"))
      .agg(count(lit(1)).as("__votes"))
      .groupBy(col("query_id"))
      .agg(max(struct(col("__votes"), (-col("__nl")).as("__neg"),
        col("__nl").as("__l"))).as("__b"))
      .join(broadcast(truth), "query_id")
      .select(col("query_id"), col("true_label"),
        col("__b.__l").as("pred_label"), col("__b.__votes").as("votes"),
        (col("__b.__l") === col("true_label")).as("correct"))
  }

  /** Embedding-space DRIFT between two corpus slices — the
    * vector-valued companion of the scalar PSI/KS monitors: per label,
    * the euclidean distance between the slices' mean vectors (centroid
    * shift), plus each side's population count. A retrained or
    * corrupted encoder moves centroids; scalar monitors on projections
    * can miss it.
    *
    * Exactness: every vector component is fixed to 1e-6 integers at
    * the scan; centroid components are exact integer sums divided
    * once; the distance is a Σ over dims of squared differences of
    * those rounded-9 rationals, each term fixed to 1e-9 before the
    * (dims-bounded) sum. One aggregation per side.
    *
    * @return (label, n_a, n_b, centroid_shift, drifted)
    */
  def embeddingDrift(a: DataFrame, b: DataFrame, threshold: Double,
                     vecCol: String = "embedding",
                     labelCol: String = "label"): DataFrame = {
    val d = "decimal(38,0)"
    def centroids(df: DataFrame, tag: String) = df
      .select(col(labelCol).cast("long").as("label"),
        posexplode(asDouble(col(vecCol))).as(Seq("__dim", "__x")))
      .groupBy(col("label"), col("__dim"))
      .agg(count(lit(1)).as(s"__n_$tag"),
        sum(round(col("__x") * 1e6).cast("long").cast(d)).as(s"__s_$tag"))
      .select(col("label"), col("__dim"), col(s"__n_$tag"),
        round(col(s"__s_$tag").cast("double") / col(s"__n_$tag") / 1e6, 9)
          .as(s"__c_$tag"))
    val j = centroids(a, "a").join(centroids(b, "b"),
      Seq("label", "__dim"))
    val diff = col("__c_a") - col("__c_b")
    j.groupBy(col("label"))
      .agg(max(col("__n_a")).as("n_a"), max(col("__n_b")).as("n_b"),
        sum(round(diff * diff * 1e9).cast("long")).as("__d9"))
      .select(col("label"), col("n_a"), col("n_b"),
        round(sqrt(col("__d9") / 1e9), 6).as("centroid_shift"),
        (round(sqrt(col("__d9") / 1e9) - threshold, 6) > 0.0).as("drifted"))
  }

  /** Per-label precision/recall/F1 of the [[knnClassify]] predictions
    * — the aggregate readout of the embedding-space label probe (macro
    * metrics are left to the reader: per-label rows avoid cross-label
    * float summation entirely). tp/fp/fn are exact integers from the
    * confusion cells; precision/recall divide them in one step and F1
    * composes the two rounded-9 ratios — engine-exact.
    *
    * @return (label, n_true, tp, fp, fn, precision, recall, f1)
    */
  def knnF1(corpus: DataFrame, queries: DataFrame, k: Int,
            idCol: String = "vec_id", vecCol: String = "embedding",
            labelCol: String = "label"): DataFrame = {
    val pred = knnClassify(corpus, queries, k, idCol, vecCol, labelCol)
    val cells = pred.groupBy(col("true_label"), col("pred_label"))
      .agg(count(lit(1)).as("__n"))
    val byTrue = cells.groupBy(col("true_label").as("label"))
      .agg(sum(col("__n")).as("n_true"),
        sum(when(col("pred_label") === col("true_label"), col("__n"))
          .otherwise(0L)).as("tp"))
    val byPred = cells.groupBy(col("pred_label").as("label"))
      .agg(sum(col("__n")).as("__npred"))
    val j = byTrue.join(byPred, Seq("label"), "full")
      .na.fill(0L, Seq("n_true", "tp", "__npred"))
    val prec = round(col("tp") / col("__npred"), 9)
    val rec = round(col("tp") / col("n_true"), 9)
    j.select(col("label"), col("n_true"), col("tp"),
        (col("__npred") - col("tp")).as("fp"),
        (col("n_true") - col("tp")).as("fn"),
        when(col("__npred") === 0, lit(null).cast("double"))
          .otherwise(round(prec, 6)).as("precision"),
        when(col("n_true") === 0, lit(null).cast("double"))
          .otherwise(round(rec, 6)).as("recall"),
        when(col("__npred") === 0 || col("n_true") === 0 ||
            (prec + rec) === 0.0, lit(null).cast("double"))
          .otherwise(round(lit(2.0) * prec * rec / (prec + rec), 6))
          .as("f1"))
  }

  /** Per-cluster simplified (centroid-based) silhouette over the IVF
    * assignment — the clustering-quality companion of [[ivfStats]]:
    * for each vector, a = distance to its own centroid, b = the
    * smallest distance to any OTHER centroid, s = (b − a)/max(a, b);
    * the per-list mean of s grades cluster cohesion vs separation
    * (→1 tight and well-separated, ≤0 overlapping).
    *
    * Scale shape: the per-vector candidate set is the nlists-row
    * centroid table (broadcast cross join — bounded, never corpus²);
    * distances are fixed to 1e-9 integers, s to 1e-9 from their exact
    * ratio, and the per-list mean divides exact integer sums — the
    * gate's layout-proof discipline end to end.
    *
    * @return (list, n_vecs, silhouette)
    */
  def silhouette(corpus: DataFrame, nlists: Int = 16, iters: Int = 3,
                 idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    val idx = buildIvfIndex(corpus, nlists, iters, idCol, vecCol)
    val spark = idx.assigned.sparkSession
    import spark.implicits._
    val centDf = idx.centroids.zipWithIndex
      .map { case (v, i) => (i, v.toSeq) }.toSeq.toDF("__cl", "__cent")
    val d2 = dot(col("c_vec"), col("c_vec")) -
      lit(2.0) * dot(col("c_vec"), col("__cent")) +
      dot(col("__cent"), col("__cent"))
    val perVec = idx.assigned.crossJoin(broadcast(centDf))
      .select(col("neighbor_id"), col("list"), col("__cl"),
        round(sqrt(greatest(d2, lit(0.0))) * 1e9).cast("long").as("__d9"))
      .groupBy(col("neighbor_id"), col("list"))
      .agg(min(when(col("__cl") === col("list"), col("__d9"))).as("__a9"),
        min(when(col("__cl") =!= col("list"), col("__d9"))).as("__b9"))
    val s9 = when(greatest(col("__a9"), col("__b9")) === 0L, lit(0L))
      .otherwise(round((col("__b9") - col("__a9")).cast("double") /
        greatest(col("__a9"), col("__b9")) * 1e9).cast("long"))
    perVec.select(col("list"), s9.as("__s9"))
      .groupBy(col("list").cast("int").as("list"))
      .agg(count(lit(1)).as("n_vecs"),
        round(sum(col("__s9")).cast("double") / count(lit(1)) / 1e9, 6)
          .as("silhouette"))
  }
}
