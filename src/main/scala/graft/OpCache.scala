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

  /** Persist `df` and retain a releasable handle to it.
    *
    * Idempotent on the *plan*, not the handle: operators that share an
    * intermediate (the dedup family reuses one shingle/signature frame
    * across queries) re-request the same analyzed plan through fresh
    * DataFrame objects, and CacheManager keys the cache off the plan —
    * a second `df.persist` is a no-op that logs "Asked to cache
    * already cached data" and would double-register a handle whose
    * release unpersists blocks another owner still needs.
    * `df.storageLevel` consults CacheManager for this plan, so an
    * already-cached plan is returned as-is with no new handle.
    */
  def persist(df: DataFrame,
              level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    if (df.storageLevel != StorageLevel.NONE) df
    else {
      val p = df.persist(level)
      handles.add((df.sparkSession, p))
      p
    }
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
