package graft.spatial

import graft.Panel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** First/nth-order grid spatial lag — reference get_splag4d
  * (splag4d.py:9-192): per-(month, feature) 2-D convolution of the panel
  * over the pgid grid with a `1/r^power` kernel (zeroed centre block,
  * optional normalisation), zero-padded at the grid boundary
  * (ndimage.convolve mode='constant' cval=0, splag4d.py:140).
  *
  * Spark-first formulation: convolution-as-join. The kernel is a tiny
  * broadcast offsets table (dx, dy, w); each cell joins its offset
  * neighbours on exact (lon+dx, lat+dy) coordinates — joining in
  * coordinate space (not pgid arithmetic) so grid-row wraparound can't
  * manufacture false neighbours — and aggregates `sum(value·w)`.
  * Missing neighbours contribute nothing, which is exactly the zero
  * padding. Cost: |panel| × |kernel| rows through one hash aggregation —
  * no N² pairs, no dense tensor; scales linearly in data and kernel
  * size, and Catalyst broadcasts the kernel automatically.
  */
object KernelLag {

  /** @param lonCol/latCol cell coordinates of each unit
    * @param out output column (reference returns input names unchanged;
    *            we name explicitly for composability)
    */
  def splag4d(panel: DataFrame, valueCol: String,
              inner: Int, width: Int, power: Double, norm: Boolean,
              lonCol: String = "lon", latCol: String = "lat",
              out: String = "splag"): DataFrame =
    splag4dMulti(panel, Seq(valueCol), inner, width, power, norm, lonCol, latCol)
      .withColumnRenamed(s"splag_$valueCol", out)

  /** Multi-feature form: all features convolved in ONE pass — the same
    * join produces one weighted sum per feature (the reference loops
    * features over tensor slices, splag4d.py:134-140; here they share
    * the join and the aggregation hash table). Outputs `splag_<c>`.
    */
  def splag4dMulti(panel: DataFrame, valueCols: Seq[String],
                   inner: Int, width: Int, power: Double, norm: Boolean,
                   lonCol: String = "lon", latCol: String = "lat"): DataFrame = {
    val spark = panel.sparkSession
    val T = Panel.TimeCol
    val U = Panel.UnitCol
    val kernel = Grid.kernelDf(spark, inner, width, power, norm)

    val cells = panel.select(
      col(T) +: col(U) +: col(lonCol) +: col(latCol) +: valueCols.map(col): _*)
    // Every (target cell, kernel offset) pair, keyed by the neighbour
    // coordinate it needs.
    val wanted = cells.select(col(T), col(U), col(lonCol), col(latCol))
      .crossJoin(broadcast(kernel))
      .select(col(T), col(U),
        (col(lonCol) + col("dx")).as("n_lon"),
        (col(latCol) + col("dy")).as("n_lat"),
        col("w"))
    val neigh = cells.select(
      col(T).as("n_t") +: col(lonCol).as("n_lon") +: col(latCol).as("n_lat") +:
        valueCols.map(c => col(c).as(s"n_$c")): _*)
    val aggs = valueCols.map(c => sum(col(s"n_$c") * col("w")).as(s"splag_$c"))
    val contrib = wanted.join(neigh,
      wanted(T) === neigh("n_t") &&
        wanted("n_lon") === neigh("n_lon") && wanted("n_lat") === neigh("n_lat"),
      "inner")
      .groupBy(wanted(T), wanted(U))
      .agg(aggs.head, aggs.tail: _*)
    // Dense-output contract (splag4d 'from_product' reindex): every input
    // cell appears, cells with no in-range neighbours get 0.
    panel.select(col(T), col(U))
      .join(contrib, Seq(T, U), "left")
      .na.fill(0.0, valueCols.map(c => s"splag_$c"))
  }
}
