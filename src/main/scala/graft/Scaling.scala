package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SCALING main: measures the top heavy operators at 1× and 10× input
  * scale on locally-synthesized fixtures, to validate the O() claims
  * the plan audits argue from sf0.1 alone (r10 directive #4). Prints
  * one JSON line per (operator, scale) with rows and wall seconds;
  * SCALING.md records the table and the growth verdicts.
  *
  * Fixtures are DETERMINISTIC pure functions of the row id (xxhash64
  * token streams, modular edge formulas), so the 1× and 10× corpora
  * have the same dup-rate / degree / event-rate characteristics and
  * growth factors compare like-for-like:
  *   - documents: ~40-104 tokens from a 30k vocab; every id ≡ 0
  *     (mod 10) near-duplicates id−1's token stream plus one extra
  *     token (a fixed 10% near-dup rate, no transitive chains);
  *   - graph: 3 modular out-edges per node (n+1, n+7, n·31 mod N) —
  *     |E| grows exactly with |V|, diameter stays low;
  *   - panel: units × months grid, value = xxhash64(unit, month) mod
  *     1000 (uniform, so an event threshold keeps a constant rate).
  *
  * Operator choices vs the audited queries: q_pagerank/q_cc_stats/
  * q_kcore measure the GRAPH algorithms on synthetic edges (their
  * registered queries cap doc_id for the DuckDB oracle's sake, and the
  * 16-bit simhashPairs generator is the documented bounded baseline —
  * the 64-bit banded variant is the scale path); q_lsh_recall's cost
  * is its bounded audit sample by design, so the production operator
  * under it (minhashLsh end-to-end) is what must scale.
  */
object Scaling {

  def synthDocs(spark: SparkSession, n: Long): DataFrame = {
    val base = when(pmod(col("id"), lit(10)) === 0 && col("id") > 0,
      col("id") - 1).otherwise(col("id"))
    val len = (pmod(xxhash64(lit("len"), base), lit(64)) + 40).cast("int")
    val toks = transform(sequence(lit(0), len - 1),
      i => concat(lit("t"), pmod(xxhash64(lit("tok"), base, i), lit(30000))))
    spark.range(n).select(col("id").as("doc_id"),
      when(pmod(col("id"), lit(10)) === 0 && col("id") > 0,
        concat(concat_ws(" ", toks), lit(" zz"), col("id")))
        .otherwise(concat_ws(" ", toks)).as("text"))
  }

  /** 3 out-edges per node: a ring edge, a 7-skip, and a multiplicative
    * shuffle edge — connected, low-diameter, degree-bounded.
    */
  def synthEdges(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(col("id"), explode(array(
      pmod(col("id") + 1, lit(n)), pmod(col("id") + 7, lit(n)),
      pmod(col("id") * 31 + 3, lit(n)))).as("dst"))
      .filter(col("id") =!= col("dst"))
      .select(least(col("id"), col("dst")).as("id_a"),
        greatest(col("id"), col("dst")).as("id_b"))
      .distinct()

  def synthPanel(spark: SparkSession, units: Long, months: Long): DataFrame =
    spark.range(units * months).select(
      (pmod(col("id"), lit(months)) + 1).as(Panel.TimeCol),
      (col("id") / lit(months)).cast("long").as(Panel.UnitCol),
      pmod(xxhash64(lit("v"), col("id")), lit(1000)).cast("double").as("value"))
      .withColumn("lon", graft.spatial.Grid.unitLon(col(Panel.UnitCol)))
      .withColumn("lat", graft.spatial.Grid.unitLat(col(Panel.UnitCol)))

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "4000000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(df: DataFrame): Long = {
      // count via noop write is not available; count() is fine here —
      // every measured operator ends in an aggregation/projection whose
      // full computation the count must execute
      df.write.format("noop").mode("overwrite").save()
      -1L
    }
    val results = scala.collection.mutable.ArrayBuffer.empty[String]
    def timed(op: String, scale: Int)(mk: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      force(mk)
      val s = (System.nanoTime() - t0) / 1e9
      val line = f"""{"op": "$op", "scale": $scale, "sec": $s%.2f}"""
      println(line)
      results += line
    }

    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    def want(op: String): Boolean = only.forall(_.contains(op))

    // materialize each fixture once so generation cost stays off the
    // operator clocks (localCheckpoint = in-JVM blocks, like the bench
    // panel cache)
    def docsAt(n: Long) = synthDocs(spark, n).localCheckpoint()
    def edgesAt(n: Long) = synthEdges(spark, n).localCheckpoint()
    def panelAt(u: Long) = synthPanel(spark, u, 30L).localCheckpoint()

    // SPARK_GRAFT_SCALES=1,10,100 widens the sweep (100× is graph-trio
    // scale: three points distinguish linear from n·log n where two
    // cannot; the doc/panel fixtures stay at 10× for wall-clock budget)
    val scales = sys.env.getOrElse("SPARK_GRAFT_SCALES", "1,10")
      .split(",").map(_.trim.toInt).toSeq
    for (scale <- scales; mult = scale.toLong) {
      // the doc fixture is capped at 10× on a default sweep (wall-clock
      // budget); an EXPLICIT SPARK_GRAFT_ONLY selection overrides —
      // the caller asked for exactly this measurement
      if (want("minhash_lsh") && (scale <= 10 || only.isDefined)) {
        val docs = docsAt(20000L * mult)
        timed("minhash_lsh", scale)(
          dedup.Dedup.minhashLsh(docs, 2, OracleExt.MinhashHashes, 2, 0.5,
            cacheShingles = false))
      }
      if (want("pagerank") || want("cc_stats") || want("kcore")) {
        val edges = edgesAt(100000L * mult)
        val nodes = edges.select(col("id_a").as("doc_id"))
          .unionByName(edges.select(col("id_b").as("doc_id"))).distinct()
        if (want("pagerank"))
          timed("pagerank", scale)(graphs.PageRank.pageRank(edges, iters = 5))
        if (want("cc_stats"))
          timed("cc_stats", scale)(dedup.Dedup.componentStats(
            dedup.Dedup.connectedComponents(nodes, edges)))
        if (want("kcore"))
          timed("kcore", scale)(graphs.KCore.kcore(edges, k = 3, rounds = 4))
      }
      // rank statistics on a CONTINUOUS value column — margin
      // cardinality ≈ row count, the exact scenario the r11
      // globalCumsum rewrite exists for (a per-value margin table as
      // large as the data, where any constant-key window would funnel
      // the whole corpus through one task)
      if ((want("spearman") || want("kruskal")) &&
          (scale <= 10 || only.isDefined)) {
        val n = 1000000L * mult
        val cont = spark.range(n).select(col("id"),
          (pmod(xxhash64(lit("x"), col("id")), lit(1000000007L))
            .cast("double") / 1000.0).as("x"),
          (pmod(xxhash64(lit("y"), col("id")), lit(1000000007L))
            .cast("double") / 1000.0).as("y"),
          pmod(col("id"), lit(7)).cast("string").as("g")).localCheckpoint()
        if (want("spearman"))
          timed("spearman", scale)(relational.Stats.spearman(cont, "x", "y"))
        if (want("kruskal"))
          timed("kruskal", scale)(
            relational.Stats.kruskalWallis(cont, "g", "y", 12.592))
      }
      // the r13 fitBaseline rewrite: per-group median/IQR via the
      // range-partitioned exact-rank machinery instead of the
      // value-buffering exact percentile. Both paths measured on the
      // same continuous-value events fixture (8 k-bounded groups,
      // group ROW counts growing with scale — the exact shape where
      // the buffering aggregate's per-group array is data-sized):
      // the rank path must grow ~linearly; the buffering twin is the
      // baseline it replaced (fine at local scales, an executor-OOM
      // cliff at corpus scale — measured here for growth, not death)
      if ((want("anomaly_fit") || want("anomaly_fit_buffering")) &&
          (scale <= 10 || only.isDefined)) {
        val n = 1000000L * mult
        val ev = spark.range(n).select(col("id").as("event_id"),
          concat(lit("e"), pmod(col("id"), lit(8))).as("event_type"),
          (pmod(xxhash64(lit("v"), col("id")), lit(1000000007L))
            .cast("double") / 1000.0).as("value")).localCheckpoint()
        if (want("anomaly_fit"))
          timed("anomaly_fit", scale)(relational.Anomaly.fitBaseline(ev))
        if (want("anomaly_fit_buffering"))
          timed("anomaly_fit_buffering", scale)(
            ev.groupBy(col("event_type")).agg(
              percentile(col("value"), lit(0.5)).as("__med"),
              (percentile(col("value"), lit(0.75)) -
                percentile(col("value"), lit(0.25))).as("__iqr")))
      }
      if ((want("spacetime_banded") || want("spacetime_broadcast")) &&
          (scale <= 10 || only.isDefined)) {
        val p = panelAt(3600L * mult)
        if (want("spacetime_banded"))
          timed("spacetime_banded", scale)(
            spatial.SpacetimeDist.spacetimeDistances(p, "value", "distances",
              k = 5, nu = 2.0, power = 0.0, eventThreshold = 950.0,
              banded = Some(spatial.SpacetimeDist.Band(4.0, 1))))
        if (want("spacetime_broadcast"))
          timed("spacetime_broadcast", scale)(
            spatial.SpacetimeDist.spacetimeDistances(p, "value", "distances",
              k = 5, nu = 2.0, power = 0.0, eventThreshold = 950.0,
              autoBandEvents = Long.MaxValue))
      }
      OpCache.release(spark)
    }
    println(results.mkString("[", ",\n ", "]"))
    spark.stop()
  }
}
