package graft

import java.sql.Timestamp

import org.apache.spark.sql.SaveMode

import graft.operators.DecisionSupport

/** Semantics of the decision-support queries on crafted star-schema
  * fixtures — each test pins the shape that distinguishes the query:
  * exact tie surfacing (q15), strict boundary comparisons rewritten in
  * decimal (q17, q18, q22), zero-order customers (q13), and the
  * excluded-supplier anti-join (q16).
  */
class DecisionSupportSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  private def writeStar(dir: String,
                        customers: Seq[(Long, String, Int, Double, String)] = Seq.empty,
                        suppliers: Seq[(Long, String, Int, Double)] = Seq.empty,
                        parts: Seq[(Long, String, String, String, Int, Double)] = Seq.empty,
                        orders: Seq[(Long, Long, String, Double, Timestamp, String)] = Seq.empty,
                        lineitems: Seq[(Long, Long, Long, Int, Double, Double, Double, Double, String, String, Timestamp)] = Seq.empty,
                        nations: Seq[(Int, String, Int)] = Seq.empty): Unit = {
    import spark.implicits._
    if (customers.nonEmpty)
      customers.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/customer.parquet")
    if (suppliers.nonEmpty)
      suppliers.toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/supplier.parquet")
    if (parts.nonEmpty)
      parts.toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/part.parquet")
    if (orders.nonEmpty)
      orders.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/orders.parquet")
    if (lineitems.nonEmpty)
      lineitems.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
          "l_quantity", "l_extendedprice", "l_discount", "l_tax",
          "l_returnflag", "l_linestatus", "l_shipdate")
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/lineitem.parquet")
    if (nations.nonEmpty)
      nations.toDF("n_nationkey", "n_name", "n_regionkey")
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/nation.parquet")
  }

  private def li(ok: Long, pk: Long, sk: Long, qty: Double, price: Double,
                 ship: String = "1996-02-01") =
    (ok, pk, sk, 1, qty, price, 0.0, 0.0, "N", "O", ts(ship))

  test("q2 surfaces every supplier tied at a part's minimum unit price") {
    val dir = tempSfDir()
    writeStar(dir,
      suppliers = Seq((1L, "s1", 0, 0.0), (2L, "s2", 0, 0.0), (3L, "s3", 0, 0.0)),
      parts = Seq((1L, "p", "Brand#1", "STANDARD", 5, 1.0)),
      lineitems = Seq(
        li(1L, 1L, 1L, 2, 20.0), // s1 unit 10
        li(2L, 1L, 1L, 1, 15.0), // s1 second offer 15 -> supplier min stays 10
        li(3L, 1L, 2L, 1, 10.0), // s2 unit 10 (tie)
        li(4L, 1L, 3L, 1, 11.0))) // s3 just above
    val got = DecisionSupport.minPriceSupplier(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getDouble(5)))
    assert(got.toSeq == Seq((1L, 1L, 10.0), (1L, 2L, 10.0)), s"got ${got.toSeq}")
  }

  test("q13 counts zero-order customers and excludes the filtered priority") {
    val dir = tempSfDir()
    writeStar(dir,
      customers = Seq(
        (1L, "c1", 0, 0.0, "A"), (2L, "c2", 0, 0.0, "A"), (3L, "c3", 0, 0.0, "A")),
      orders = Seq(
        // c1: two counted orders + one excluded priority
        (10L, 1L, "O", 1.0, ts("1996-01-01"), "1-URGENT"),
        (11L, 1L, "O", 1.0, ts("1996-01-02"), "5-LOW"),
        (12L, 1L, "O", 1.0, ts("1996-01-03"), "4-NOT SPECIFIED"),
        // c2: one counted order
        (13L, 2L, "O", 1.0, ts("1996-01-04"), "2-HIGH")))
    val got = DecisionSupport.orderCountDistribution(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // c3 has zero orders; c2 one; c1 two (the NOT SPECIFIED one dropped)
    assert(got == Set((0L, 1L), (1L, 1L), (2L, 1L)))
  }

  test("q15 surfaces every supplier tied at the maximum revenue") {
    val dir = tempSfDir()
    writeStar(dir,
      suppliers = Seq((1L, "s1", 0, 0.0), (2L, "s2", 0, 0.0), (3L, "s3", 0, 0.0)),
      lineitems = Seq(
        li(1L, 1L, 1L, 1, 100.0), // s1: 100
        li(2L, 1L, 2L, 1, 60.0), li(3L, 1L, 2L, 1, 40.0), // s2: 100 (tie)
        li(4L, 1L, 3L, 1, 99.99))) // s3: just below
    val got = DecisionSupport.topSupplier(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 100.0), (2L, 100.0)))
  }

  test("q16 excludes negative-balance suppliers from the variety count") {
    val dir = tempSfDir()
    writeStar(dir,
      suppliers = Seq((1L, "ok", 0, 10.0), (2L, "bad", 0, -5.0)),
      parts = Seq((1L, "blue bolt", "Brand#1", "SMALL", 5, 1.0)),
      lineitems = Seq(li(1L, 1L, 1L, 1, 1.0), li(2L, 1L, 2L, 1, 1.0)))
    val got = DecisionSupport.supplierVariety(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3)))
    assert(got.toSeq == Seq(("Brand#1", "SMALL", 5, 1L)),
      "supplier 2 (negative balance) must not count")
  }

  test("q17 keeps strictly-below-half-average quantities via the decimal cross-multiply") {
    val dir = tempSfDir()
    // one part: quantities 2, 10, 9 -> avg 7, half-avg 3.5; only qty 2
    // qualifies; 3.5 itself would be EXCLUDED were it present (strict <)
    writeStar(dir,
      parts = Seq((1L, "p", "Brand#2", "SMALL", 1, 1.0)),
      lineitems = Seq(
        li(1L, 1L, 1L, 2, 70.0), li(2L, 1L, 1L, 10, 1.0), li(3L, 1L, 1L, 9, 1.0)))
    val got = DecisionSupport.smallQtyRevenue(spark, dir).collect()
    assert(got.head.getDouble(0) == 10.0) // 70 / 7
  }

  test("q18 threshold is strict and order rows carry the quantity rollup") {
    val dir = tempSfDir()
    writeStar(dir,
      customers = Seq((1L, "c1", 0, 0.0, "A")),
      orders = Seq(
        (10L, 1L, "O", 500.0, ts("1996-01-01"), "5-LOW"),
        (11L, 1L, "O", 900.0, ts("1996-01-02"), "5-LOW")),
      lineitems = Seq(
        li(10L, 1L, 1L, 300, 1.0), // exactly 300: excluded (strict >)
        li(11L, 1L, 1L, 200, 1.0), li(11L, 1L, 1L, 101, 1.0))) // 301: kept
    val got = DecisionSupport.largeOrders(spark, dir)
      .collect().map(r => (r.getLong(2), r.getDouble(5)))
    assert(got.toSeq == Seq((11L, 301.0)))
  }

  test("q22 cutoff is exact: a customer at the positive-balance average is excluded") {
    val dir = tempSfDir()
    // positive balances 10, 20, 30 -> avg exactly 20; the customer at 20
    // must NOT pass (strict >); negative balance never counts toward avg
    writeStar(dir,
      customers = Seq(
        (1L, "c1", 0, 10.0, "A"), (2L, "c2", 0, 20.0, "A"),
        (3L, "c3", 1, 30.0, "A"), (4L, "c4", 1, -99.0, "A")),
      orders = Seq((10L, 3L, "O", 1.0, ts("1999-06-01"), "5-LOW")))
    val got = DecisionSupport.idleRichCustomers(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    // c3 is above avg but ordered recently; c2 is exactly at avg -> nobody
    // from nation 1; nation 0 has none above avg either -> empty
    assert(got.isEmpty)
  }

  test("q22 includes an above-average idle customer") {
    val dir = tempSfDir()
    writeStar(dir,
      customers = Seq(
        (1L, "c1", 0, 10.0, "A"), (2L, "c2", 1, 30.0, "A")),
      orders = Seq((10L, 1L, "O", 1.0, ts("1999-06-01"), "5-LOW")))
    val got = DecisionSupport.idleRichCustomers(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1, 1L, 30.0)))
  }

  test("q7 keeps only cross-nation pairs between the two chosen nations") {
    val dir = tempSfDir()
    writeStar(dir,
      suppliers = Seq((1L, "s1", 1, 0.0), (2L, "s2", 2, 0.0), (3L, "s3", 3, 0.0)),
      customers = Seq((1L, "c1", 1, 0.0, "A"), (2L, "c2", 2, 0.0, "A")),
      orders = Seq(
        (10L, 1L, "O", 1.0, ts("1996-01-01"), "5-LOW"),
        (11L, 2L, "O", 1.0, ts("1996-01-02"), "5-LOW")),
      lineitems = Seq(
        li(10L, 1L, 2L, 1, 100.0), // supp 2 -> cust 1: counted
        li(10L, 1L, 1L, 1, 999.0), // supp 1 -> cust 1: same nation, dropped
        li(11L, 1L, 1L, 1, 200.0), // supp 1 -> cust 2: counted
        li(11L, 1L, 3L, 1, 999.0))) // supp nation 3: outside the pair, dropped
    val got = DecisionSupport.nationTrade(spark, dir, nationA = 1, nationB = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1, 2, 1996L, 200.0), (2, 1, 1996L, 100.0)))
  }

  test("q9 groups revenue by nation and order year for the name-filtered part family") {
    val dir = tempSfDir()
    writeStar(dir,
      suppliers = Seq((1L, "s1", 0, 0.0), (2L, "s2", 1, 0.0)),
      parts = Seq(
        (1L, "hot gear", "Brand#1", "SMALL", 1, 1.0),
        (2L, "blue bolt", "Brand#1", "SMALL", 1, 1.0)), // name miss: dropped
      nations = Seq((0, "N0", 0), (1, "N1", 0)),
      orders = Seq(
        (10L, 1L, "O", 1.0, ts("1995-03-01"), "5-LOW"),
        (11L, 1L, "O", 1.0, ts("1996-03-01"), "5-LOW")),
      lineitems = Seq(
        li(10L, 1L, 1L, 1, 100.0), li(11L, 1L, 1L, 1, 50.0),
        li(10L, 1L, 2L, 1, 30.0), li(10L, 2L, 1L, 1, 999.0)))
    val got = DecisionSupport.nationRevenue(spark, dir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    assert(got.toSeq == Seq(
      ("N0", 1996, 50.0), ("N0", 1995, 100.0), ("N1", 1995, 30.0)))
  }
}
