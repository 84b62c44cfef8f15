package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Verifies the scale-layout claims: month partitioning actually prunes
  * and bucketing actually removes the window shuffle.
  */
class PanelIOSpec extends SparkSpec {
  import spark.implicits._
  private val T = Panel.TimeCol
  private val U = Panel.UnitCol

  test("month partitioning prunes the scan to the filtered range") {
    val dir = Files.createTempDirectory("graft_panel").toString
    val p = (for (m <- 1L to 10L; u <- 1L to 20L) yield (m, u, m * u * 1.0))
      .toDF(T, U, "value")
    PanelIO.writePartitioned(p, dir)
    val q = PanelIO.readPartitioned(spark, dir).filter(col(T) >= 8)
    val scan = q.queryExecution.executedPlan.toString()
    // the month predicate must land in PartitionFilters (planning-time
    // directory pruning), not as a post-scan Filter
    assert(scan.contains("PartitionFilters") && scan.contains("month_id"), scan)
    assert(scan.contains("(month_id#") && scan.contains(">= 8"), scan)
    assert(q.count() == 3 * 20)
  }

  test("bucketed table: unit-window aggregation plans without an exchange") {
    spark.sql("DROP TABLE IF EXISTS panel_bucketed")
    val loc = new java.io.File("spark-warehouse/panel_bucketed")
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(loc)
    }
    val p = (for (m <- 1L to 5L; u <- 1L to 8L) yield (m, u, m + u * 1.0))
      .toDF(T, U, "value")
    PanelIO.writeBucketed(p, "panel_bucketed", buckets = 4)
    val t = spark.table("panel_bucketed")
    val windowed = t.select(col(T), col(U),
      ops.TemporalOps.movingSum(col("value"), 3).as("ms"))
    val plan = windowed.queryExecution.executedPlan.toString()
    val exchanges = plan.split("\n").count(_.contains("Exchange"))
    assert(exchanges == 0,
      s"bucketed window should be shuffle-free, got $exchanges exchanges:\n$plan")
    assert(windowed.count() == 40)
  }
}
