package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc phase timer for operator development: times index build vs
  * search phases of the ANN operators at SPARK_GRAFT_SF_DIR.
  * Run: sbt "runMain graft.tools.TimeProbe"
  */
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    e.count()
    for (pass <- 1 to 2) {
      println(s"[probe] --- pass $pass ---")
      val idx = t("buildPqIndex")(
        graft.similarity.Pq.buildPqIndex(e, m = 4, ksub = 8, iters = 2))
      t("codes force")(
        idx.codes.write.format("noop").mode("overwrite").save())
      t("pqSearch force")(
        graft.similarity.Pq.pqSearch(idx, e.filter(col("vec_id") < 50), 10)
          .write.format("noop").mode("overwrite").save())
      // stage bisect: join+adc without the rank window
      val q = e.filter(col("vec_id") < 50)
        .select(col("vec_id").as("query_id"),
          col("embedding").cast("array<double>").as("q_vec"))
      val m = 4; val ksub = 8; val dsub = 16
      def sv(c: org.apache.spark.sql.Column, s: Int) = slice(c, s * dsub + 1, dsub)
      val lutCols = (0 until m).map { s =>
        array((0 until ksub).map { j =>
          val cent = idx.codebooks(s)(j)
          graft.similarity.Similarity.dot(sv(col("q_vec"), s),
            typedlit(cent.toSeq)) * -2.0 + lit(cent.map(x => x * x).sum)
        }: _*).as(s"lut$s")
      }
      val qlut = q.select(col("query_id") +: lutCols: _*)
      t("qlut force")(qlut.write.format("noop").mode("overwrite").save())
      val adc = (0 until m).map(s =>
        element_at(col(s"lut$s"), col(s"code$s") + 1)).reduce(_ + _)
      val joined = idx.codes.crossJoin(broadcast(qlut))
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("adc_dist", round(adc, 6))
      t("join+adc force")(joined.write.format("noop").mode("overwrite").save())
      t("count joined")(println("[probe] rows=" + joined.count()))
    }
    spark.stop()
  }
}
