package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-job profiler for optimization work (r15): runs named
  * SparkEntry queries under a listener and prints every Spark job's
  * wall-clock, stage count, task count, and call site — the local-mode
  * substitute for the Spark UI's job table (the bench runs with the UI
  * off). Run:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.JobProbe q_x q_y"
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]
    val stageTasks = new java.util.concurrent.ConcurrentHashMap[Int, (Int, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = js.stageInfos.lastOption.map(_.name.take(90)).getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), site, js.stageIds.length))
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = for {
          s <- si.submissionTime; c <- si.completionTime
        } yield c - s
        stageTasks.put(si.stageId, (si.numTasks, ms.getOrElse(-1L)))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, site, nStages) =>
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"[job] id=${je.jobId}%4d ${sec}%7.3f s stages=$nStages%3d  $site")
        }
      }
    })

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup, mirroring Bench
    force(graft.SparkEntry.queries("q_identity")(spark, dir))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    val names = if (args.nonEmpty) args.toSeq else Seq("q_identity")
    names.foreach { n =>
      println(s"===== $n =====")
      for (pass <- 1 to 2) {
        println(s"--- pass $pass ---")
        val t0 = System.nanoTime()
        force(graft.SparkEntry.queries(n)(spark, dir))
        println(f"[total] $n pass $pass: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        graft.OpCache.release(spark)
      }
    }
    spark.stop()
  }
}
