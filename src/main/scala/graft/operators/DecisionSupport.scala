package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Decision-support queries over the TPC-H-ish star schema — the classic
  * shapes (correlated aggregates, scalar subqueries, IN/NOT-IN rewrites,
  * distribution histograms) adapted to the driver's schema (no partsupp
  * table, no commit/receipt dates). Same plan discipline as Analytics:
  * decimal money partials, broadcast dimensions, aggregate-before-join
  * wherever the join only needs the rollup.
  *
  * Float discipline: every predicate that compares a value against a
  * derived average is rewritten as a cross-multiplied decimal comparison
  * (`x * n > sum` instead of `x > sum / n`) so the boundary is exact in
  * both engines — a partial-aggregated double average can differ from a
  * serial one in the last ulp, and a filter boundary is exactly where that
  * bites.
  */
object DecisionSupport {

  private def money(c: org.apache.spark.sql.Column) = c.cast("decimal(12,2)")
  private def rate(c: org.apache.spark.sql.Column) = c.cast("decimal(3,2)")
  private val one = lit(1).cast("decimal(3,2)")

  /** q9: revenue by nation and order year for one product family (TPC-H Q9
    * minus the partsupp cost leg). Part and supplier are broadcast
    * dimensions; the only fact-fact shuffle is lineitem ⋈ orders on the
    * order key; the (nation, year) aggregate is partial-mergeable.
    */
  def nationRevenue(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .filter(col("p_name").contains("gear"))
      .select("p_partkey")
    val s = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val n = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_orderdate")
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(money(col("l_extendedprice")) * (one - rate(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** q2: cheapest supplier per part (TPC-H Q2's correlated minimum, with
    * the unit price observed in lineitem standing in for ps_supplycost).
    * The per-group ARGMIN shape q15's global max doesn't cover: offers
    * aggregate to (part, supplier) minima, the per-part minimum joins back
    * on the part key, and the equality keeps every supplier tied at the
    * minimum. Unit price is a single IEEE division — identical in every
    * engine, so the min and the tie-back equality are exact without any
    * decimal detour. Both aggregates partial-merge; the join back is
    * key-partitioned on the part key (never broadcast: parts are unbounded
    * at fleet scale).
    */
  def minPriceSupplier(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .filter(col("p_type") === "STANDARD" && col("p_size") < 10)
      .select("p_partkey", "p_brand", "p_size")
    val offers = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        (col("l_extendedprice") / col("l_quantity")).as("unit"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("unit")).as("offer"))
    val cheapest = offers.groupBy(col("l_partkey").as("pk"))
      .agg(min(col("offer")).as("best"))
    offers
      .join(cheapest, col("l_partkey") === col("pk") && col("offer") === col("best"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey").as("p_partkey"), col("p_brand"),
        col("p_size").cast("int").as("p_size"), col("s_suppkey"), col("s_name"),
        round(col("offer"), 4).as("min_unit_price"))
      .orderBy("p_partkey", "s_suppkey")
  }

  /** q13: customer order-count distribution — how many customers placed k
    * orders, for every k including zero. The per-customer count aggregates
    * orders on the customer key BEFORE touching the customer table (the
    * aggregate is |customers|-sized, so it stays a shuffle join, never a
    * broadcast); the histogram is a second, tiny aggregate.
    */
  def orderCountDistribution(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
    Tables.customer(spark, dir)
      .select("c_custkey")
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("n_orders"), lit(0L)).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** q15: top supplier by quarter revenue (TPC-H Q15's scalar-subquery max,
    * view-free). Revenue per supplier is one partial-mergeable aggregate of
    * the date-pruned fact slice; the maximum rides back in as a one-row
    * broadcast and the equality runs on exact decimals, so ties (all rows at
    * the max) surface exactly as the spec requires.
    */
  def topSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("date") &&
        col("l_shipdate") < lit("1996-04-01").cast("date"))
      .groupBy(col("l_suppkey"))
      .agg(sum(money(col("l_extendedprice")) * (one - rate(col("l_discount"))))
        .as("total_rev"))
    val maxRev = rev.agg(max(col("total_rev")).as("max_rev"))
    rev.crossJoin(broadcast(maxRev))
      .filter(col("total_rev") === col("max_rev"))
      .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_rev").cast("double").as("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** q16: supplier variety per part segment (TPC-H Q16 with the observed
    * lineitem (part, supplier) pairs standing in for partsupp, and negative
    * account balance standing in for the complaints filter). The part filter
    * broadcasts; the excluded-supplier list broadcasts as an anti-join; the
    * distinct-supplier count shuffles once on the (brand, type, size) key.
    */
  def supplierVariety(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#2" && col("p_type") =!= "PROMO" &&
        col("p_size") <= 25)
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val excluded = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0)
      .select("s_suppkey")
    Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size").cast("int").as("p_size"))
      .agg(count_distinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** q17: revenue from unusually small orders of one brand (TPC-H Q17's
    * correlated average). The per-part average is rewritten cross-multiplied
    * — `qty * 2 * n_part < sum_part` instead of `qty < avg/2` — so the
    * boundary is decimal-exact under any partial-aggregation order. The
    * per-part aggregate joins back on the part key (shuffle join: the
    * brand-filtered part set is unbounded at fleet scale).
    */
  def smallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .filter(col("p_brand") === "Brand#2")
      .select("p_partkey")
    val li = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
    val perPart = li.groupBy(col("l_partkey").as("pk"))
      .agg(sum(money(col("l_quantity"))).as("qty_sum"),
        count(lit(1)).as("qty_n"))
    li.join(perPart, col("l_partkey") === col("pk"))
      .filter(money(col("l_quantity")) * lit(2) * col("qty_n") < col("qty_sum"))
      .agg(round(sum(money(col("l_extendedprice"))).cast("double") / 7.0, 4)
        .as("avg_yearly"))
  }

  /** q18: large-volume orders (TPC-H Q18). The quantity rollup reduces
    * lineitem to per-order totals first; the >300 survivors are a tiny
    * relation that broadcasts into orders, and the order rows broadcast into
    * customer — the fact table is aggregated before any join.
    */
  def largeOrders(spark: SparkSession, dir: String, minQty: Int = 300): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(money(col("l_quantity"))).as("total_qty"))
      .filter(col("total_qty") > minQty)
    val ord = Tables.orders(spark, dir)
      .join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice", "total_qty")
    Tables.customer(spark, dir)
      .select("c_custkey", "c_name")
      .join(broadcast(ord), col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_orderdate_us"),
        col("o_totalprice"),
        col("total_qty").cast("double").as("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** q22: well-funded customers gone idle (TPC-H Q22 on nations instead of
    * phone prefixes). The positive-balance average arrives as a one-row
    * broadcast of (sum, count) and the comparison cross-multiplies in
    * decimal (`bal * n > sum`), so the cutoff is exact; recent purchasers
    * are removed with a LEFT ANTI join on the order's customer key.
    */
  def idleRichCustomers(spark: SparkSession, dir: String): DataFrame = {
    val pos = Tables.customer(spark, dir)
      .filter(col("c_acctbal") > 0)
      .agg(sum(money(col("c_acctbal"))).as("bal_sum"),
        count(lit(1)).as("bal_n"))
    val recent = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1999-01-01").cast("date"))
      .select("o_custkey")
    Tables.customer(spark, dir)
      .crossJoin(broadcast(pos))
      .filter(money(col("c_acctbal")) * col("bal_n") > col("bal_sum"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").cast("int").as("c_nationkey"))
      .agg(count(lit(1)).as("n_custs"),
        sum(money(col("c_acctbal"))).cast("double").as("total_bal"))
      .orderBy("c_nationkey")
  }
}
