package graft

import graft.spatial.{CountryLag, TreeLag}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.storage.StorageLevel

/** Session-scoped cache for value-independent spatial geometry: the
  * quadtree embedding, the country adjacency, and the BFS ring sets.
  *
  * All three are pure functions of the panel's unit/month universe —
  * not of the value columns — yet each derivation costs a distinct
  * pass over the panel (and, for rings, a chain of BFS self-joins).
  * At 100 TB a pipeline that re-derives them per operator invocation
  * spends more on geometry than on the lag itself, so every caller —
  * the direct operator API and the JSON wire-format dispatch alike —
  * shares one persisted copy per (session, unit universe).
  *
  * Keying: two inputs share geometry iff their panels' (time, unit)
  * projections optimise to semantically-equal plans. Using the
  * OPTIMISED plan's semantic hash makes the key blind to value-column
  * transforms: `panel.select(T, U, f(value))` prunes back to the same
  * `Project(T, U, scan)` as the raw panel, so a pipeline step that
  * runs after pointwise/temporal transforms still hits the cache
  * built by a direct query. A miss is only a recompute — never an
  * incorrect reuse (different universes hash differently; the Int
  * hash's collision risk over a handful of live panels is
  * negligible).
  *
  * Lifetime: entries persist until [[clear]]. Handles to every
  * persisted DataFrame are retained here, so — unlike a fire-and-
  * forget `persist` inside an operator — a long-lived session can
  * always release the blocks.
  */
object GeoCache {

  private final case class Key(session: SparkSession, planHash: Int)

  // plan-idempotent persist (the OpCache discipline): a ring set can
  // optimise to a plan CacheManager already holds (order-1 ring ==
  // the adjacency), and re-persisting an equal plan is a warning +
  // double bookkeeping, never a second cache.
  //
  // The idempotence cuts both ways: the cache entry this memo leans on
  // can be OWNED by an OpCache handle for an equal plan, and a foreign
  // `OpCache.release` (Bench runs one per query) then unpersists it
  // while the memo lives on — a silent recompute-forever cliff. Every
  // memoized READ therefore re-checks the storage level and re-persists
  // when a foreign release stranded it (see [[adjacency]]/[[ring]]).
  private def persistIdem(df: DataFrame): DataFrame =
    if (df.storageLevel != StorageLevel.NONE) df
    else df.persist(StorageLevel.MEMORY_AND_DISK)

  private def keyOf(panel: DataFrame): Key =
    Key(panel.sparkSession,
      panel.select(col(Panel.TimeCol), col(Panel.UnitCol))
        .queryExecution.optimizedPlan.semanticHash())

  private val embs =
    scala.collection.concurrent.TrieMap.empty[Key, TreeLag.Embedding]
  private val adjs =
    scala.collection.concurrent.TrieMap.empty[Key, DataFrame]
  private val cents =
    scala.collection.concurrent.TrieMap.empty[Key, DataFrame]
  private val rings =
    scala.collection.concurrent.TrieMap.empty[(Key, Int, Int), DataFrame]
  private val pairSets =
    scala.collection.concurrent.TrieMap.empty[Key, Seq[(Long, Long)]]

  /** Quadtree cell embedding of `gridPanel` (must carry lon/lat cell
    * columns) — one distinct+collect per unit universe, shared across
    * the tree/grid/fourier/mesh operators.
    */
  def embedding(gridPanel: DataFrame,
                lonCol: String = "lon", latCol: String = "lat"): TreeLag.Embedding =
    embs.getOrElseUpdate(keyOf(gridPanel),
      TreeLag.embedOf(gridPanel, lonCol, latCol))

  /** Month-replicated queen adjacency of the panel's unit grid,
    * persisted with a retained handle.
    */
  def adjacency(panel: DataFrame): DataFrame =
    persistIdem(adjs.getOrElseUpdate(keyOf(panel),
      persistIdem(CountryLag.gridAdjacency(panel, persist = false))))

  /** Unit centroids (country_id, lon, lat) for the country lag. */
  def centroids(panel: DataFrame): DataFrame =
    cents.getOrElseUpdate(keyOf(panel), CountryLag.gridCentroids(panel))

  /** BFS ring set for a (inner, width) kernel shape, persisted with a
    * retained handle. The cached geometry is the derived GRID adjacency
    * — month-invariant by construction — so the BFS runs on the driver
    * over the static (a_id, b_id) pair list and the finished ring is
    * replicated per month (`ringSetStatic`), instead of expanding a
    * months-replicated frontier through `months ×` the join work. A
    * truly month-varying adjacency must go through
    * `CountryLag.ringSet` instead.
    */
  def ring(panel: DataFrame, inner: Int, width: Int): DataFrame =
    persistIdem(rings.getOrElseUpdate((keyOf(panel), inner, width), {
      val pairs = pairSets.getOrElseUpdate(keyOf(panel),
        CountryLag.gridAdjacencyPairsLocal(panel))
      persistIdem(CountryLag.ringSetStatic(panel, pairs, inner, width))
    }))

  /** Release every cached block owned by `session` and drop the
    * entries (other sessions' caches are untouched).
    */
  def clear(session: SparkSession): Unit = {
    def owned[K](m: scala.collection.concurrent.TrieMap[K, DataFrame])(sel: K => SparkSession): Unit =
      m.keys.filter(k => sel(k) == session).foreach { k =>
        m.remove(k).foreach(_.unpersist())
      }
    owned(adjs)(_.session)
    owned(rings)(_._1.session)
    cents.keys.filter(_.session == session).foreach(cents.remove)
    embs.keys.filter(_.session == session).foreach(embs.remove)
    pairSets.keys.filter(_.session == session).foreach(pairSets.remove)
  }
}
