package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped registry of operator-internal persisted DataFrames
  * (the cached shingle tables of Dedup.minhashLsh /
  * Contamination.boilerplateRatio).
  *
  * Same retained-handle rule as [[GeoCache]]: an operator must never
  * fire-and-forget a `persist` — in a long-lived session those blocks
  * accumulate until teardown with no way to release them. Operators
  * register here instead, and a service calls [[release]] between
  * requests (or callers opt out of caching and manage their own
  * materialisation).
  */
object OpCache {

  private val handles =
    new java.util.concurrent.ConcurrentLinkedQueue[(SparkSession, DataFrame)]

  /** Persist `df` and retain a releasable handle to it. */
  def persist(df: DataFrame,
              level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val p = df.persist(level)
    handles.add((df.sparkSession, p))
    p
  }

  /** Unpersist every handle owned by `session` and drop it (other
    * sessions' handles are untouched).
    */
  def release(session: SparkSession): Unit = {
    val it = handles.iterator()
    while (it.hasNext) {
      val (s, df) = it.next()
      if (s == session) {
        df.unpersist()
        it.remove()
      }
    }
  }
}
