package graft

import org.apache.spark.sql.functions._
import graft.spatial.ZOrder

/** Morton-key algebra and the clustered-write data-skipping property. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def refZ(x: Int, y: Int): Long = {
    // bit-by-bit reference interleave
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc |
        (((x >> i) & 1).toLong << (2 * i)) |
        (((y >> i) & 1).toLong << (2 * i + 1))
    }
  }

  test("zkey matches the bit-by-bit reference interleave") {
    val pts = Seq((0, 0), (1, 0), (0, 1), (1, 1), (39, 17), (65535, 65535),
      (255, 256), (40, 12))
    val df = pts.toDF("x", "y")
      .withColumn("z", ZOrder.zkey(col("x"), col("y")))
    df.collect().foreach { r =>
      assert(r.getLong(2) == refZ(r.getInt(0), r.getInt(1)),
        s"(${r.getInt(0)}, ${r.getInt(1)})")
    }
  }

  test("unspread inverts spread (round trip through zLon/zLat)") {
    val df = (0 until 500).map(i => (i * 131 % 65536, i * 37 % 65536))
      .toDF("x", "y")
      .withColumn("z", ZOrder.zkey(col("x"), col("y")))
      .withColumn("x2", ZOrder.zLon(col("z")))
      .withColumn("y2", ZOrder.zLat(col("z")))
    assert(df.filter(col("x2") =!= col("x") || col("y2") =!= col("y")).count() == 0)
  }

  test("clustered write yields files with tight disjoint spatial extents") {
    val grid = for { x <- 0 until 32; y <- 0 until 32 } yield (x, y, x * 32 + y)
    val df = grid.toDF("lon", "lat", "v")
    val path = java.nio.file.Files.createTempDirectory("zorder").toString + "/t"
    ZOrder.writeClustered(df, path, "lon", "lat", numFiles = 8)

    val perFile = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("lon").as("lon0"), max("lon").as("lon1"),
        min("lat").as("lat0"), max("lat").as("lat1"),
        count(lit(1)).as("n"))
      .collect()
    assert(perFile.length == 8)
    // every file's bounding box covers at most ~1/4 of each axis — the
    // row-group stats a box predicate prunes on are tight. An unsorted
    // write would give every file the full 0..31 extent on both axes.
    perFile.foreach { r =>
      val area = (r.getAs[Int]("lon1") - r.getAs[Int]("lon0") + 1).toLong *
        (r.getAs[Int]("lat1") - r.getAs[Int]("lat0") + 1)
      assert(area <= 1024 / 2,
        s"file extent too loose: area $area for ${r.getAs[Long]("n")} rows")
    }
    // a box query reads a minority of files via those stats
    val box = perFile.count(r =>
      r.getAs[Int]("lon1") >= 4 && r.getAs[Int]("lon0") <= 7 &&
        r.getAs[Int]("lat1") >= 4 && r.getAs[Int]("lat0") <= 7)
    assert(box <= 3, s"box 4..7×4..7 overlaps $box of 8 files")
  }
}
