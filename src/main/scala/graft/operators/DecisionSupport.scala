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

  /** q7: trade volume between two nations (TPC-H Q7) — revenue shipped by
    * NATION_1's suppliers to NATION_2's customers and vice versa, per ship
    * year. The supplier dim broadcasts; customer is fleet-scale, so orders
    * joins it on the customer key (shuffle, both sides nation-pruned
    * first), and the nation-decorated orders join lineitem on the order
    * key — the same two fact-fact shuffles as q8, with the cross-nation
    * filter applied as soon as both nations are in scope. Decimal revenue
    * sums; the (supp_nation, cust_nation, year) aggregate partial-merges.
    */
  def nationTrade(spark: SparkSession, dir: String,
                  nationA: Int = 2, nationB: Int = 3): DataFrame = {
    val sup = Tables.supplier(spark, dir)
      .filter(col("s_nationkey").isin(nationA, nationB))
      .select(col("s_suppkey"), col("s_nationkey").as("supp_nation"))
    val cust = Tables.customer(spark, dir)
      .filter(col("c_nationkey").isin(nationA, nationB))
      .select(col("c_custkey"), col("c_nationkey").as("cust_nation"))
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "cust_nation")
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation").cast("int").as("supp_nation"),
        col("cust_nation").cast("int").as("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(money(col("l_extendedprice")) * (one - rate(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** q8: national market share (TPC-H Q8) — of the revenue an ASIA-region
    * customer base generates on ECONOMY parts, what fraction is supplied by
    * NATION_3, per order year. Part/supplier/nation/region broadcast; the
    * two fact-fact shuffles (lineitem ⋈ orders on the order key, then ⋈
    * customer on the customer key — customer is fleet-scale, never
    * broadcast) carry only pruned columns. The share divides two decimal
    * sums once per year row, so partial-aggregation order can't move it.
    */
  def marketShare(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .filter(col("p_type") === "ECONOMY").select("p_partkey")
    val supNation = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_nationkey").as("sup_nation"))
    val asiaNations = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val cust = Tables.customer(spark, dir)
      .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey")
    val rev = money(col("l_extendedprice")) * (one - rate(col("l_discount")))
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supNation), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        sum(when(col("sup_nation") === 3, rev).otherwise(lit(0).cast("decimal(12,2)")))
          .as("nation_rev"),
        sum(rev).as("total_rev"))
      .select(col("o_year"),
        round(col("nation_rev").cast("double") / col("total_rev").cast("double"), 6)
          .as("mkt_share"),
        col("total_rev").cast("double").as("total_rev"))
      .orderBy("o_year")
  }

  /** q12: shipping-lateness priority audit (TPC-H Q12 with lateness bands
    * standing in for ship modes — the schema has no l_shipmode or commit
    * date). Each line lands in a months-late band
    * (floor(days(ship − order)/30), clamped to [-1, 6]) and the band counts how
    * many of its lines belong to critical-priority orders vs not — Q12's
    * exact high/low split. One fact-fact shuffle on the order key, then a
    * 7-row aggregate; both aggregates partial-merge.
    */
  def lateShipments(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_orderdate", "o_orderpriority")
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_shipdate")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(greatest(
          least(floor(datediff(col("l_shipdate"), col("o_orderdate")) / 30), lit(6L)),
          lit(-1L)).as("months_late"),
        high.as("is_high"))
      .groupBy(col("months_late"))
      .agg(sum(when(col("is_high"), 1L).otherwise(0L)).as("high_line_count"),
        sum(when(col("is_high"), 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("months_late")
  }

  /** q21: suppliers who single-handedly held up multi-supplier orders
    * (TPC-H Q21's double-EXISTS, with shipdate > orderdate + 90 days
    * standing in for receipt-past-commit). Instead of two correlated
    * subqueries, the joined fact first collapses to one row per
    * (order, supplier) — every aggregate after that is a plain count/sum,
    * so no distinct-aggregate Expand ever doubles the fact shuffle — then
    * per order: the supplier count, late-supplier count, and the sole late
    * supplier (max over a when() — well-defined exactly when the late
    * count is 1); blame lands only when n_supp > 1 ∧ n_late = 1. The
    * per-supplier tally is a third, tiny aggregate.
    */
  def blameSupplier(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val late = col("l_shipdate") > date_add(col("o_orderdate").cast("date"), 90)
    val perSupp = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(late, 1).otherwise(0)).as("is_late"))
    val perOrder = perSupp
      .groupBy(col("l_orderkey"))
      .agg(
        count(lit(1)).as("n_supp"),
        sum(col("is_late")).as("n_late"),
        max(when(col("is_late") === 1, col("l_suppkey"))).as("late_supp"))
      .filter(col("n_supp") > 1 && col("n_late") === 1)
    perOrder
      .groupBy(col("late_supp").as("s_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_name")
        .withColumnRenamed("s_suppkey", "sk")), col("s_suppkey") === col("sk"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey"))
      .limit(20)
  }

  /** q11: important stock value (TPC-H Q11). The schema has no partsupp, so
    * one is synthesized deterministically — 4 offers per part, all columns
    * pure integer arithmetic on (p_partkey, i) — identically derivable by
    * any engine (the oracle rebuilds it in SQL). Values stay in integer
    * cents so every sum is exact, and the "more than 0.1% of total stock"
    * cut is the cross-multiplied `part_value * 1000 > total` against a
    * one-row broadcast — no float boundary anywhere. Scale shape: the
    * synthetic dimension explodes from part (narrow), the one shuffle keys
    * on the part key, and the threshold never materializes on the driver.
    */
  def importantStock(spark: SparkSession, dir: String): DataFrame = {
    val nSupp = Tables.supplier(spark, dir).agg(count(lit(1)).as("n_supp"))
    val ps = Tables.part(spark, dir).select("p_partkey")
      .select(col("p_partkey"), explode(sequence(lit(0L), lit(3L))).as("i"))
      .crossJoin(broadcast(nSupp))
      .select(
        col("p_partkey"),
        ((col("p_partkey") * 7 + col("i") * 13) % col("n_supp")).as("ps_suppkey"),
        ((col("p_partkey") * 31 + col("i") * 17) % 1000 + 1).as("ps_availqty"),
        ((col("p_partkey") * 53 + col("i") * 29) % 20000 + 100).as("ps_cost_cents"))
    val natSupp = Tables.supplier(spark, dir)
      .filter(col("s_nationkey") === 3).select(col("s_suppkey"))
    val stock = ps
      .join(broadcast(natSupp), col("ps_suppkey") === col("s_suppkey"), "left_semi")
      .select(col("p_partkey"), (col("ps_availqty") * col("ps_cost_cents")).as("v_cents"))
    val total = stock.agg(sum(col("v_cents")).as("total_cents"))
    stock.groupBy(col("p_partkey"))
      .agg(sum(col("v_cents")).as("part_cents"))
      .crossJoin(broadcast(total))
      .filter(col("part_cents") * 1000 > col("total_cents"))
      .select(col("p_partkey"),
        (col("part_cents").cast("double") / 100.0).as("stock_value"))
      .orderBy(col("stock_value").desc, col("p_partkey"))
  }

  /** q20: suppliers holding surplus stock (TPC-H Q20's nested EXISTS chain,
    * on the same synthesized partsupp as q11). A supplier qualifies when,
    * for some part it stocks, availqty > half the quantity the fleet
    * shipped of that part in 1996 — the restock-candidate list. The
    * shipped-quantity rollup reduces lineitem to per-part totals FIRST
    * (integer-cents discipline isn't needed: quantities are small ints;
    * the half comparison cross-multiplies `2*avail > shipped` so there is
    * no float boundary); the rollup joins the synthetic dimension on the
    * part key; the per-supplier surplus-part count (instead of Q20's bare
    * membership — every supplier stocks enough parts that membership alone
    * is vacuous on this data) rides a tiny second aggregate into the
    * supplier dim.
    */
  def stockSurplus(spark: SparkSession, dir: String): DataFrame = {
    val nSupp = Tables.supplier(spark, dir).agg(count(lit(1)).as("n_supp"))
    val ps = Tables.part(spark, dir).select("p_partkey")
      .select(col("p_partkey"), explode(sequence(lit(0L), lit(3L))).as("i"))
      .crossJoin(broadcast(nSupp))
      .select(
        col("p_partkey"),
        ((col("p_partkey") * 7 + col("i") * 13) % col("n_supp")).as("ps_suppkey"),
        ((col("p_partkey") * 31 + col("i") * 17) % 1000 + 1).as("ps_availqty"))
    val shipped = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("date") &&
        col("l_shipdate") < lit("1997-01-01").cast("date"))
      .groupBy(col("l_partkey"))
      .agg(sum(money(col("l_quantity"))).as("shipped_qty"))
    val surplus = ps
      .join(shipped, col("p_partkey") === col("l_partkey"))
      .filter(money(col("ps_availqty")) * 2 > col("shipped_qty"))
      .groupBy(col("ps_suppkey"))
      .agg(count_distinct(col("p_partkey")).as("n_surplus_parts"))
    Tables.supplier(spark, dir)
      .join(surplus, col("s_suppkey") === col("ps_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_surplus_parts"))
      .orderBy("s_suppkey")
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
