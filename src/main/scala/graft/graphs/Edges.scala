package graft.graphs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared edge-list plumbing for the graph family. */
object Edges {

  /** Symmetrize an (a, b) pair list into both directions (two-branch
    * union + distinct — the r14-proven shape, now shared instead of
    * copied across five operators).
    *
    * r15 note: a row-local explode variant (one execution of the pair
    * pipeline instead of one per direction) was built and A/B'd; under
    * this box's stall waves the union form measured at parity or
    * better in every paired subset run, and the union's two branches
    * overlap on idle cores anyway (wall ≈ max(branch), not sum), so
    * the proven shape stays. Revisit on a quiet box in r16 — the
    * explode halves CPU on the expensive banded pair generators even
    * if wall-clock ties at sf0.1.
    */
  def symmetrize(pairs: DataFrame, srcCol: String, dstCol: String): DataFrame =
    pairs.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .unionByName(pairs.select(col(dstCol).cast("long").as("src"),
        col(srcCol).cast("long").as("dst")))
      .distinct()
}
