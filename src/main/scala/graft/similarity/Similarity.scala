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

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact cosine top-k: for each query vector (`queries`), the k
    * most-similar corpus vectors (excluding itself), deterministically
    * tie-broken by corpus id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("q_vec")))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("c_vec"))
    val scored = c.crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("q_vec"), col("c_vec")))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"),
        col("rank").cast("int").as("rank"))
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
    val scored = c.join(broadcast(q), "bucket")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("q_vec"), col("c_vec")))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"),
        col("rank").cast("int").as("rank"))
  }
}
