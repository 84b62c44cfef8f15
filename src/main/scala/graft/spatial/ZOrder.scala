package graft.spatial

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for spatial data skipping.
  *
  * Parquet prunes row groups with min/max column statistics, but a
  * grid panel written in (time, unit) order scatters any spatial
  * neighbourhood across every file — a bounding-box query prunes
  * nothing. Interleaving the bits of (lon, lat) into one Morton key
  * and range-partitioning + sorting the write by it puts spatially
  * near cells into the same row groups, so BOTH lon and lat min/max
  * stats become tight per file and a box predicate skips most of a
  * 100 TB table at planning/scan time. This is the standard lakehouse
  * `OPTIMIZE ZORDER BY` layout, expressed with plain Spark writes.
  *
  * The key is a closed-form codegen'd expression (shift/mask bit
  * spreading — no UDF), identical arithmetic in any engine, so layout
  * keys computed by this library and by e.g. a DuckDB-side loader
  * agree bit-for-bit.
  */
object ZOrder {

  /** Spread the low 16 bits of `c`: bit i moves to bit 2i (the classic
    * mask ladder, on longs throughout — no sign traps).
    */
  def spreadBits16(c: Column): Column = {
    val x0 = c.cast("long").bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton key of two 16-bit cell coordinates: lon bits on the
    * even lanes, lat bits on the odd lanes.
    */
  def zkey(lon: Column, lat: Column): Column =
    spreadBits16(lon).bitwiseOR(shiftleft(spreadBits16(lat), 1))

  /** Inverse of [[spreadBits16]] (collect the even-lane bits). */
  def unspreadBits16(c: Column): Column = {
    val x0 = c.cast("long").bitwiseAND(lit(0x55555555L))
    val x1 = x0.bitwiseOR(shiftright(x0, 1)).bitwiseAND(lit(0x33333333L))
    val x2 = x1.bitwiseOR(shiftright(x1, 2)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftright(x2, 4)).bitwiseAND(lit(0x00FF00FFL))
    x3.bitwiseOR(shiftright(x3, 8)).bitwiseAND(lit(0xFFFFL))
  }

  def zLon(z: Column): Column = unspreadBits16(z)
  def zLat(z: Column): Column = unspreadBits16(shiftright(z, 1))

  /** Write `df` Z-clustered on (lonCol, latCol): range-partition on the
    * Morton key (`numFiles` output files with contiguous, disjoint
    * key ranges — a distributed sample-based range exchange, no global
    * sort), sort within each partition, drop the transient key. Every
    * output file then carries tight min/max on both coordinates.
    */
  def writeClustered(df: DataFrame, path: String, lonCol: String,
                     latCol: String, numFiles: Int): Unit =
    df.withColumn("__z", zkey(col(lonCol), col(latCol)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
