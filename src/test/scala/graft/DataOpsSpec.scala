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

  test("v4 outlier audit: exact median/MAD, k*MAD verdicts, null exclusion, MAD-0 degenerate") {
    import spark.implicits._
    val dir = tempSfDir()
    // A: {10,20,30,40,1000} -> med 30? no: interpolated median of 5 values
    //    = 30? sorted {10,20,30,40,1000} middle = 30; adev {20,10,0,10,970}
    //    -> MAD = 10; cut 3*10=30: only 970 > 30 -> 1 outlier of 5.
    //    A null value must not count anywhere.
    // B: {5,5,5,5,9} -> med 5, adev {0,0,0,0,4} -> MAD 0; cut 0: the one
    //    deviating value flags (the degenerate verdict, not an error)
    val rows =
      Seq((1L, "A", Some(10.0)), (2L, "A", Some(20.0)), (3L, "A", Some(30.0)),
        (4L, "A", Some(40.0)), (5L, "A", Some(1000.0)), (6L, "A", None),
        (7L, "B", Some(5.0)), (8L, "B", Some(5.0)), (9L, "B", Some(5.0)),
        (10L, "B", Some(5.0)), (11L, "B", Some(9.0)))
    rows.map { case (id, t, v) => (id, ts("2024-01-10"), id, t, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/events.parquet")
    val got = DataOps.outlierAudit(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      ("A", 5L, 30.0, 10.0, 1L, 200000L),
      ("B", 5L, 5.0, 0.0, 1L, 200000L)), s"got ${got.toSeq}")
  }

  test("v3 expectation rules fail on crafted violations and pass on clean data") {
    import spark.implicits._
    val dir = tempSfDir()
    // one null quantity (completeness fails), one discount 0.5 (max fails),
    // quantity 60 (max fails); mins and distinct counts stay legal
    Seq(
      (1L, Option(2.0), Option(0.1), Option("N")),
      (2L, Option(60.0), Option(0.5), Option("R")),
      (3L, None, Option(0.0), Option("A")))
      .toDF("l_orderkey", "l_quantity", "l_discount", "l_returnflag")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/lineitem.parquet")
    val got = DataOps.expectationCheck(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("l_discount max <= 0.1", 0.5, false, 3L),
      ("l_discount min >= 0", 0.0, true, 3L),
      ("l_quantity completeness = 1", 1.0 - 1.0 / 3.0, false, 3L),
      ("l_quantity max <= 50", 60.0, false, 3L),
      ("l_quantity min >= 1", 2.0, true, 3L),
      ("l_returnflag distinct <= 3", 3.0, true, 3L),
      ("table non-empty", 3.0, true, 3L)), s"got ${got.toSeq}")
  }

  test("cdc2 SCD2 intervals: lead closes each validity window, last state is current") {
    import spark.implicits._
    val dir = tempSfDir()
    // customer 1: states in 1995 and 1997 (1996 skipped: intervals follow
    // observed states, not calendar years); customer 2: single state
    Seq(
      (1L, "1995-03-01", 10.0), (2L, "1995-07-01", 20.0),
      (3L, "1997-02-01", 30.0), (4L, "1995-01-01", 40.0))
      .map { case (k, d, p) =>
        (k, if (k == 4L) 2L else 1L, java.sql.Date.valueOf(d), p)
      }
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/orders.parquet")
    val got = DataOps.scd2History(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        Option(r.get(2)).map(_.asInstanceOf[Int]), r.getBoolean(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == Seq(
      (1L, 1995, Some(1997), false, 2L, 30.0),
      (1L, 1997, None, true, 1L, 30.0),
      (2L, 1995, None, true, 1L, 40.0)), s"got ${got.toSeq}")
  }

  test("cdc3 MERGE audit: inserts new keys, updates touched AND interval-closed rows, passes the rest") {
    import spark.implicits._
    val dir = tempSfDir()
    Seq(
      // c1: 1995 state untouched by the delta, still current -> unchanged
      (1L, 1L, java.sql.Date.valueOf("1995-03-01"), 10.0),
      // c2: pre-cutoff 1996 state + TWO delta orders inside 1997 -> the
      // 1996 row closes (interval update) and the 1997 insert proves the
      // delta re-aggregates before upserting
      (2L, 2L, java.sql.Date.valueOf("1996-05-01"), 20.0),
      (3L, 2L, java.sql.Date.valueOf("1997-08-01"), 5.0),
      (7L, 2L, java.sql.Date.valueOf("1997-09-01"), 2.5),
      // c3: 1995 state + delta opens a NEW 1998 period -> the 1995 row's
      // interval closes (update with equal aggregates), 1998 inserts
      (4L, 3L, java.sql.Date.valueOf("1995-02-01"), 40.0),
      (5L, 3L, java.sql.Date.valueOf("1998-02-01"), 7.0),
      // c4: brand-new customer entirely from the delta -> insert
      (6L, 4L, java.sql.Date.valueOf("1999-01-01"), 3.0))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/orders.parquet")
    val got = DataOps.mergeUpsert(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        Option(r.get(2)).map(_.asInstanceOf[Int]), r.getBoolean(3),
        r.getLong(4), r.getDouble(5), r.getString(6)))
    assert(got.toSeq == Seq(
      (1L, 1995, None, true, 1L, 10.0, "unchanged"),
      (2L, 1996, Some(1997), false, 1L, 20.0, "update"),
      (2L, 1997, None, true, 2L, 7.5, "insert"),
      (3L, 1995, Some(1998), false, 1L, 40.0, "update"),
      (3L, 1998, None, true, 1L, 7.0, "insert"),
      (4L, 1999, None, true, 1L, 3.0, "insert")), s"got ${got.toSeq}")
    // kernel-vs-rebuild invariant: the merged values equal cdc2 over all
    // orders (the decimal split-exactness the streaming twin relies on)
    val rebuilt = DataOps.scd2History(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(4), r.getDouble(5))).toSeq
    assert(got.map(t => (t._1, t._2, t._5, t._6)).toSeq == rebuilt)
  }

  test("drift1 PSI is zero for identical windows and flags the shifted distribution") {
    import spark.implicits._
    val dir = tempSfDir()
    // type A: both windows all in bin 0 -> every bin has p == q -> PSI 0
    // type B: old mass in bin 0, new mass in bin 9 -> two big terms
    val rows =
      (1L to 4L).map(i => (i, "2024-01-10 00:00:00", 1L, "A", 10.0)) ++
      (5L to 8L).map(i => (i, "2024-01-20 00:00:00", 1L, "A", 10.0)) ++
      (9L to 12L).map(i => (i, "2024-01-10 00:00:00", 1L, "B", 10.0)) ++
      (13L to 16L).map(i => (i, "2024-01-20 00:00:00", 1L, "B", 480.0))
    rows.map { case (id, t, u, typ, v) => (id, Timestamp.valueOf(t), u, typ, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/events.parquet")
    def r(x: Double, s: Int): BigDecimal =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP)
    // B's two nonzero terms are symmetric: (5/14 - 1/14) * ln 5 each
    val term = r((4.0 / 14.0) * math.log(5.0), 9)
    val psiB = r((term + term).toDouble, 6).toDouble
    val got = DataOps.psiDrift(spark, dir)
      .collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getDouble(3),
        x.getBoolean(4)))
    assert(got.toSeq == Seq(
      ("A", 4L, 4L, 0.0, false),
      ("B", 4L, 4L, psiB, true)), s"got ${got.toSeq}")
  }

  test("drift2 KS is exact on crafted CDFs and spans value buckets") {
    import spark.implicits._
    val dir = tempSfDir()
    // A: identical windows -> D = 0. B: disjoint supports -> D = 1.
    // C: interleaved, max gap 8/16 at v=40 — and its support straddles
    // the 50-wide cumsum bucket boundary, exercising the offset join.
    def ev(ids: Range, t: String, typ: String, vs: Seq[Double]) =
      ids.zip(vs).map { case (i, v) => (i.toLong, t, typ, v) }
    val rows =
      ev(1 to 4, "2024-01-10 00:00:00", "A", Seq(10, 20, 30, 40)) ++
      ev(5 to 8, "2024-01-20 00:00:00", "A", Seq(10, 20, 30, 40)) ++
      ev(9 to 12, "2024-01-10 00:00:00", "B", Seq(10, 20, 30, 40)) ++
      ev(13 to 16, "2024-01-20 00:00:00", "B", Seq(110, 120, 130, 140)) ++
      ev(17 to 20, "2024-01-10 00:00:00", "C", Seq(10, 20, 30, 40)) ++
      ev(21 to 24, "2024-01-20 00:00:00", "C", Seq(10, 20, 50, 60))
    rows.map { case (id, t, typ, v) =>
      (id, Timestamp.valueOf(t), 1L, typ, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/events.parquet")
    val got = DataOps.ksDrift(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5)))
    assert(got.toSeq == Seq(
      ("A", 4L, 4L, 0L, 0.0, false),
      ("B", 4L, 4L, 16L, 1.0, true),
      ("C", 4L, 4L, 8L, 0.5, true)), s"got ${got.toSeq}")
  }

  test("drift2 KS degenerate window: a one-sided type pages with NULL ks") {
    import spark.implicits._
    val dir = tempSfDir()
    // A straddles the cutoff (defined statistic); D exists only BEFORE it
    // and E only AFTER — neither has a defined two-sample KS, so ks must
    // be NULL (never 0/0 = NaN) and drifted true (drift3's convention: a
    // type that appeared or vanished outright is definitionally drifted)
    Seq(
      (1L, "2024-01-10 00:00:00", "A", 10.0),
      (2L, "2024-01-20 00:00:00", "A", 10.0),
      (3L, "2024-01-10 00:00:00", "D", 10.0),
      (4L, "2024-01-20 00:00:00", "E", 10.0))
      .map { case (id, t, typ, v) =>
        (id, Timestamp.valueOf(t), 1L, typ, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/events.parquet")
    val got = DataOps.ksDrift(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) -1.0 else r.getDouble(4), r.getBoolean(5)))
    assert(got.toSeq == Seq(
      ("A", 1L, 1L, 0L, 0.0, false),
      ("D", 1L, 0L, 0L, -1.0, true),
      ("E", 0L, 1L, 0L, -1.0, true)), s"got ${got.toSeq}")
  }

  test("drift3 chi2 is exact on crafted tables incl. the degenerate windows") {
    import spark.implicits._
    val dir = tempSfDir()
    def ev(ids: Range, t: String, typ: String, vs: Seq[Double]) =
      ids.zip(vs).map { case (i, v) => (i.toLong, t, typ, v) }
    // A: identical window distributions over two bins -> chi2 exactly 0.
    // B: disjoint bins -> per-bin terms 4.0 + 4.0 = 8.0 > 3.841 (dof 1)
    //    -> drifted. C: ONE occupied bin -> dof 0, can never reject.
    // D: new window empty -> undefined test, NULL chi2, pages.
    val rows =
      ev(1 to 4, "2024-01-10 00:00:00", "A", Seq(10, 10, 60, 60)) ++
      ev(5 to 8, "2024-01-20 00:00:00", "A", Seq(10, 10, 60, 60)) ++
      ev(9 to 12, "2024-01-10 00:00:00", "B", Seq(10, 10, 10, 10)) ++
      ev(13 to 16, "2024-01-20 00:00:00", "B", Seq(110, 110, 110, 110)) ++
      ev(17 to 20, "2024-01-10 00:00:00", "C", Seq(10, 10, 10, 10)) ++
      ev(21 to 24, "2024-01-20 00:00:00", "C", Seq(10, 10, 10, 10)) ++
      ev(25 to 27, "2024-01-10 00:00:00", "D", Seq(10, 10, 10))
    rows.map { case (id, t, typ, v) =>
      (id, Timestamp.valueOf(t), 1L, typ, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/events.parquet")
    val got = DataOps.chi2Drift(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getInt(4), if (r.isNullAt(5)) -1.0 else r.getDouble(5),
        r.getBoolean(6)))
    assert(got.toSeq == Seq(
      ("A", 4L, 4L, 2, 1, 0.0, false),
      ("B", 4L, 4L, 2, 1, 8.0, true),
      ("C", 4L, 4L, 1, 0, 0.0, false),
      ("D", 3L, 0L, 1, 0, -1.0, true)), s"got ${got.toSeq}")
  }

  test("drift ops exclude null values from mass and totals alike") {
    import spark.implicits._
    val dir = tempSfDir()
    // two real values per window plus a null in each: without the
    // exclusion rule Spark's least/greatest would clamp the nulls into
    // the TOP bin (phantom drift mass) while still counting them
    Seq(
      (1L, "2024-01-10 00:00:00", "A", Some(10.0)),
      (2L, "2024-01-10 00:00:00", "A", Some(60.0)),
      (3L, "2024-01-10 00:00:00", "A", None),
      (4L, "2024-01-20 00:00:00", "A", Some(10.0)),
      (5L, "2024-01-20 00:00:00", "A", Some(60.0)),
      (6L, "2024-01-20 00:00:00", "A", None))
      .map { case (id, t, typ, v) =>
        (id, Timestamp.valueOf(t), 1L, typ, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/events.parquet")
    val psi = DataOps.psiDrift(spark, dir).collect().head
    assert((psi.getLong(1), psi.getLong(2), psi.getDouble(3)) ==
      ((2L, 2L, 0.0)), s"psi row: ${psi.toSeq}")
    val ks = DataOps.ksDrift(spark, dir).collect().head
    assert((ks.getLong(1), ks.getLong(2), ks.getLong(3)) == ((2L, 2L, 0L)),
      s"ks row: ${ks.toSeq}")
    val chi = DataOps.chi2Drift(spark, dir).collect().head
    assert((chi.getLong(1), chi.getLong(2), chi.getDouble(5)) ==
      ((2L, 2L, 0.0)), s"chi2 row: ${chi.toSeq}")
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

  test("q8 sketch verdicts hold and exact twins match a recompute on real sf0.001 data") {
    // q8 now publishes the exact twins + in-entry tolerance verdicts (the
    // driver hash-checks them against an all-true oracle); this spec
    // re-derives the exact columns independently and asserts every sketch
    // verdict fired true. Sketches are deterministic, so this is stable.
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val got = graft.operators.Analytics.approxStats(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)),
          (r.getBoolean(4), r.getBoolean(5), r.getBoolean(6)))).toMap
    val exact = graft.Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("nd"),
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.95)"), 6).as("p95"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got.keySet == exact.keySet)
    exact.foreach { case (t, e) =>
      val (twins, (ndOk, medOk, p95Ok)) = got(t)
      assert(twins == e, s"$t exact twins: $twins vs $e")
      assert(ndOk && medOk && p95Ok, s"$t sketch verdicts: $ndOk $medOk $p95Ok")
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
