package graft

import org.apache.spark.sql.SparkSession

/** BENCH main: runs every SparkEntry query against SPARK_GRAFT_SF_DIR
  * and prints one JSON line with per-query wall-clock seconds.
  *
  * Each query is forced through the noop sink (all columns computed,
  * nothing collected) — `count()` would let Catalyst prune the very
  * projections being benchmarked. A small warmup query first absorbs
  * JVM/codegen startup so per-query numbers measure the plans.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // bounded top-k aggregators over panel-cardinality groups
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4000000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup: JVM/codegen/parquet-footer costs AND the shared panel
    // cache materialisation land here, not on the first measured query
    force(SparkEntry.queries("q_identity")(spark, sfDir))

    // optional comma-separated filter for local iteration
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try force(fn(spark, sfDir))
      catch { case e: Throwable =>
        failures += name
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // millisecond precision keeps the whole line under ~2.7 KB for ~90
    // queries — the harness captures only a bounded tail of the run's
    // output, and the JSON line must fit inside it in full to parse
    def ms(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // a thrown query records near-zero wall-clock — surface it so a
    // regression can't masquerade as a fast run
    val fj = failures.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qs,"failures":$fj,"sf":"$sfDir"}""")
    spark.stop()
  }
}
