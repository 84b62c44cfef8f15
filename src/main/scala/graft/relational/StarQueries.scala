package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational analytics over the TPC-H-style star schema — the general
  * query surface around the panel engine. Shapes chosen so the physical
  * plans demonstrate the cluster-scale fundamentals: predicate pushdown
  * into the parquet scans, broadcast of dimension tables, partial
  * aggregation, and top-k without a global sort.
  */
object StarQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** TPC-H Q1 shape: scan-heavy aggregation with computed measures;
    * the date filter pushes into the scan, aggregation is map-side
    * partial over a handful of groups.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        // quantities are integer-valued, so their double sums are exact;
        // the money sums ride exact integer units (cents / 1e-4 for the
        // discounted product) — fact-table-scale float sums are
        // accumulation-order-dependent and wobble against a fixed canon
        sum(col("l_quantity")).as("sum_qty"),
        (sum(round(col("l_extendedprice") * 100).cast("long")
          .cast("decimal(38,0)")).cast("double") / 100.0)
          .as("sum_base_price"),
        (sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * 10000).cast("long").cast("decimal(38,0)")).cast("double")
          / 10000.0).as("sum_disc_price"),
        avg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))

  /** Hierarchical revenue totals via native ROLLUP — per (returnflag,
    * linestatus) cell, per returnflag subtotal, and the grand total in
    * ONE aggregation pass (Catalyst expands the grouping sets; the
    * fact table is scanned once, partial aggregation map-side).
    * `grouping_id()` disambiguates the null super-aggregate keys —
    * identical bitmask semantics to SQL GROUPING(). Revenue rounds to
    * cents in-query: super-aggregate sums fold the whole fact table,
    * where raw float ULP order noise would straddle a 1e-6 canon.
    */
  def revenueRollup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * 10000).cast("long").cast("decimal(38,0)")).cast("double")
          / 10000.0, 2).as("revenue"),
        count(lit(1)).as("n_items"),
        grouping_id().cast("int").as("gid"))

  /** TPC-H Q3 shape: fact-to-fact join with a broadcast dimension and a
    * deterministic top-k by revenue (row_number window over the small
    * aggregated side — never a global sort of the fact table).
    */
  def topUnshippedOrders(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val cust = t(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val orders = t(spark, dir, "orders")
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    val revenue = li
      .join(orders, li("l_orderkey") === orders("o_orderkey"))
      .join(broadcast(cust), orders("o_custkey") === cust("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
    // Distributed top-k: orderBy+limit compiles to TakeOrderedAndProject
    // (per-partition heap + driver merge of k rows) — no stage ever
    // moves the full aggregated order set to one partition. The rank
    // window then runs over exactly k surviving rows, so its single
    // partition is k-bounded by construction, not data-dependent; the
    // constant-valued partition key keeps WindowExec from logging the
    // unpartitioned-window warning, which should stay reserved for
    // data-dependent single-partition windows. pmod(key, 1) ≡ 0 but is
    // NOT foldable, so EliminateWindowPartitions can't strip it the way
    // it strips a bare literal.
    revenue.orderBy(col("revenue").desc, col("l_orderkey")).limit(k)
      .withColumn("rk", row_number().over(
        Window.partitionBy(graft.plans.PlanLint.kBoundedKey(col("l_orderkey")))
          .orderBy(col("revenue").desc, col("l_orderkey"))))
      .select(col("l_orderkey"), col("o_orderdate"), col("revenue"),
        col("rk").cast("int").as("rk"))
  }

  /** Star join through two broadcast dimension hops (nation → region):
    * revenue per region, every dimension a BroadcastHashJoin.
    */
  def regionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val supp = t(spark, dir, "supplier")
    val nation = t(spark, dir, "nation")
    val region = t(spark, dir, "region")
    // revenue is an integer SUM of per-row 1e-6 fixings (the r14 panel
    // discipline): at ~4e8 totals over ~60k rows a float SUM's
    // reassociation noise reaches the 1e-6 output grid, so the result's
    // 6th decimal depends on scan/merge order — the order-invariance
    // audit (tools/verify_order_invariance.py) caught exactly this
    // query flipping under a perturbed scan. Per-row terms are
    // identical doubles in both engines; the integer sum is exact
    // under any merge schedule. Long headroom: |Σ·1e6| < 9.2e18 holds
    // to ~9e12 in revenue units, four orders above TPC-H SF100's
    // largest regional total.
    val term = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    li.join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
      .join(broadcast(nation), supp("s_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("r_name"))
      .agg((sum(round(term * lit(1e6)).cast("long")).cast("double") / lit(1e6))
          .as("revenue"),
        count(lit(1)).as("n_items"))
  }
}
