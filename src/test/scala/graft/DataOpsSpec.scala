package graft

import java.sql.Timestamp

import org.apache.spark.sql.SaveMode

import graft.operators.DataOps

/** Semantics of the data-ops utilities: null/distinct accounting in the
  * one-pass profile, and insert/update/unchanged classification in the
  * snapshot diff.
  */
class DataOpsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  test("v1 counts nulls and distincts per column in one pass") {
    import spark.implicits._
    val dir = tempSfDir()
    Seq(
      (1L, Option(2.0), Option(0.1), Option("N")),
      (2L, Option(2.0), Option(0.2), None),
      (3L, None, Option(0.1), Option("R")))
      .toDF("l_orderkey", "l_quantity", "l_discount", "l_returnflag")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/lineitem.parquet")
    val got = DataOps.tableProfile(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("l_discount", 3L, 0L, 2L),
      ("l_quantity", 3L, 1L, 1L),
      ("l_returnflag", 3L, 1L, 2L)))
  }

  test("v2 integrity audit counts orphans per relationship") {
    import spark.implicits._
    val dir = tempSfDir()
    // third lineitem row references order 99, which doesn't exist
    Seq((1L, 1L, 1L), (2L, 1L, 1L), (99L, 1L, 1L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/lineitem.parquet")
    Seq((1L, 1L), (2L, 7L)) // order 2 references missing customer 7
      .toDF("o_orderkey", "o_custkey")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/orders.parquet")
    Seq(Tuple1(1L)).toDF("p_partkey")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/part.parquet")
    Seq(Tuple1(1L)).toDF("s_suppkey")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/supplier.parquet")
    Seq(Tuple1(1L)).toDF("c_custkey")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/customer.parquet")
    val got = DataOps.integrityCheck(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("lineitem->orders", 3L, 1L),   // l_orderkey 99 dangles
      ("lineitem->part", 3L, 0L),
      ("lineitem->supplier", 3L, 0L),
      ("orders->customer", 2L, 1L)))  // o_custkey 7 dangles
  }

  test("q8 sketch stats track exact distincts and percentiles on real sf0.001 data") {
    // rows-only q8 hardened against exact aggregates: HLL++ at rsd=0.01
    // must land within 3% of true distincts, and the quantile sketch at
    // accuracy 2000 within the 1/2000 rank guarantee (loose value bound
    // here: 5% of the exact quantile). Sketches are deterministic.
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val approx = graft.operators.Analytics.approxStats(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = graft.Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("nd"),
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.95)").as("p95"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (t, (nd, p50, p95)) =>
      val (and, a50, a95) = approx(t)
      assert(math.abs(and - nd).toDouble / nd <= 0.03, s"$t distinct: $and vs $nd")
      assert(math.abs(a50 - p50) / p50 <= 0.05, s"$t p50: $a50 vs $p50")
      assert(math.abs(a95 - p95) / p95 <= 0.05, s"$t p95: $a95 vs $p95")
    }
  }

  test("cdc1 classifies new customers as inserts, changed as updates, drops unchanged") {
    import spark.implicits._
    val dir = tempSfDir()
    Seq(
      // c1: one order before both cutoffs -> unchanged, dropped
      (10L, 1L, "O", 100.0, ts("1996-06-01"), "5-LOW"),
      // c2: order before old cutoff + another between cutoffs -> update
      (11L, 2L, "O", 100.0, ts("1996-06-01"), "5-LOW"),
      (12L, 2L, "O", 50.0, ts("1998-06-01"), "5-LOW"),
      // c3: first order between the cutoffs -> insert
      (13L, 3L, "O", 75.0, ts("1998-01-01"), "5-LOW"),
      // c4: order after BOTH cutoffs -> in neither snapshot, absent
      (14L, 4L, "O", 75.0, ts("1999-06-01"), "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/orders.parquet")
    val got = DataOps.snapshotDiff(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (2L, "update", 2L, 150.0, 1L),
      (3L, "insert", 1L, 75.0, 0L)))
  }
}
