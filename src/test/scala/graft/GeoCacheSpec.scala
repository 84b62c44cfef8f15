package graft

import org.apache.spark.sql.execution.columnar.InMemoryRelation
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.spatial.CountryLag

/** Pins the GeoCache/OpCache ownership contract (the r11 fix,
  * GeoCache.scala persistIdem/adjacency): GeoCache's memo can lean on
  * a CacheManager entry OWNED by an OpCache handle for a semantically
  * equal plan — CacheManager keys caches off the plan, so whichever
  * registry persisted first owns the blocks. A foreign
  * `OpCache.release` (Bench runs one per query) then strands the memo:
  * the DataFrame handle lives on, its blocks are gone. Every memoized
  * READ must therefore re-check the storage level and re-persist —
  * one recompute to rebuild the blocks, not a recompute-forever cliff.
  */
class GeoCacheSpec extends SparkSpec {
  import spark.implicits._

  private def freshPanel() = {
    // a unit universe no other suite uses, so this spec's GeoCache
    // key cannot collide with entries another suite memoized
    val units = Seq(7701L, 7702L, 7703L, 7740L, 7741L, 7742L)
    (1L to 3L).flatMap(m => units.map(u => (m, u, (m + u).toDouble)))
      .toDF(Panel.TimeCol, Panel.UnitCol, "value")
  }

  test("a foreign OpCache.release strands the memoized adjacency; the " +
      "next GeoCache read re-persists it (once, not forever)") {
    val panel = freshPanel()

    // Interleaving step 1 — OpCache persists the adjacency plan FIRST,
    // so ITS handle owns the CacheManager entry
    val foreign = OpCache.persist(CountryLag.gridAdjacency(panel, persist = false))
    assert(foreign.storageLevel != StorageLevel.NONE)

    // step 2 — GeoCache memoizes: persistIdem sees the plan already
    // cached (by the foreign owner) and must NOT double-register
    val adj1 = GeoCache.adjacency(panel)
    assert(adj1.storageLevel != StorageLevel.NONE)
    adj1.count() // materialize the blocks under the foreign owner

    // step 3 — the foreign release: Bench's per-query hygiene call.
    // The memoized handle is now stranded (blocks gone, memo alive).
    OpCache.release(spark)
    assert(adj1.storageLevel == StorageLevel.NONE,
      "precondition: the foreign release must actually strand the memo " +
        "(if this fails, the interleaving no longer reproduces the cliff)")

    // step 4 — the contract under test: a memoized READ re-checks and
    // re-persists (r11 fix). Without it this read returns a NONE-level
    // frame and every consumer recomputes the BFS-adjacency forever.
    val adj2 = GeoCache.adjacency(panel)
    assert(adj2.storageLevel != StorageLevel.NONE,
      "memoized read after a foreign release must re-persist")
    assert(adj2.count() === adj1.count())

    // step 5 — once, not forever: with the blocks rebuilt, a further
    // read resolves through CacheManager — its plan collapses to an
    // InMemoryRelation, so downstream consumers scan cached blocks
    // instead of re-deriving the adjacency
    val adj3 = GeoCache.adjacency(panel)
    assert(adj3.storageLevel != StorageLevel.NONE)
    assert(adj3.queryExecution.withCachedData.exists(
      _.isInstanceOf[InMemoryRelation]),
      "post-repersist reads must resolve to the in-memory relation")
  }

  test("ring sets survive the same foreign-release interleaving") {
    val panel = freshPanel()
    val ring1 = GeoCache.ring(panel, 1, 1)
    assert(ring1.storageLevel != StorageLevel.NONE)
    ring1.count()
    OpCache.release(spark)
    // whether or not OpCache owned these exact blocks, the read-side
    // contract holds: the returned frame is persisted
    val ring2 = GeoCache.ring(panel, 1, 1)
    assert(ring2.storageLevel != StorageLevel.NONE,
      "ring read after a foreign release must re-persist")
    assert(ring2.count() === ring1.count())
  }
}
