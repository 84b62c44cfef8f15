package graft.tools

import org.apache.spark.sql.SparkSession

/** Writes `.explain("formatted")` for named SparkEntry queries to
  * plans/<tag-dir>/<query>_<tag>.txt — the judge-checkable plan
  * evidence for optimization rounds. Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 \
  *     sbt "runMain graft.tools.PlanDump r15 after q_x q_y"
  * (first arg: plans/ subdirectory; second: file tag; rest: queries).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <dir> <tag> <query>...")
    val (sub, tag, names) = (args(0), args(1), args.drop(2).toSeq)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4000000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val out = java.nio.file.Paths.get("plans", sub)
    java.nio.file.Files.createDirectories(out)
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(out.resolve(s"${n}_$tag.txt"),
        txt.getBytes("UTF-8"))
      println(s"[plandump] wrote ${out.resolve(s"${n}_$tag.txt")}")
      graft.OpCache.release(spark)
    }
    spark.stop()
  }
}
