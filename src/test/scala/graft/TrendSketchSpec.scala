package graft

import java.sql.Timestamp

import org.apache.spark.sql.SaveMode

import graft.operators.Analytics

/** Regression-aggregate and sketch-union semantics on crafted events. */
class TrendSketchSpec extends SparkSpec {

  private def writeEvents(rows: Seq[(Long, String, Long, String, Double)]): String = {
    import spark.implicits._
    val dir = tempSfDir()
    rows.map { case (id, ts, user, typ, v) =>
      (id, Timestamp.valueOf(ts), user, typ, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/events.parquet")
    dir
  }

  test("q_trend recovers an exactly linear trend with r2 = 1") {
    // value = 2 * hours-since-anchor + 5, sampled at three points
    val dir = writeEvents(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "A", 5.0),
      (2L, "2024-01-01 01:00:00", 1L, "A", 7.0),
      (3L, "2024-01-01 02:00:00", 1L, "A", 9.0),
      // constant series: slope 0, r2 undefined -> NaN-safe check separately
      (4L, "2024-01-01 00:00:00", 1L, "B", 3.0),
      (5L, "2024-01-01 01:00:00", 1L, "B", 4.0)))
    val got = Analytics.valueTrend(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq(("A", 3L, 2.0), ("B", 2L, 1.0)))
  }

  test("sketch union counts a cross-day user once") {
    val dir = writeEvents(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "A", 1.0),
      (2L, "2024-01-02 10:00:00", 1L, "A", 1.0), // same user, next day
      (3L, "2024-01-01 11:00:00", 2L, "A", 1.0),
      (4L, "2024-01-03 10:00:00", 3L, "B", 1.0)))
    val got = Analytics.sketchUnion(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // HLL is exact at this cardinality: A has 2 users over 2 days, B 1 over
    // 1 — the published exact twin plus the union-vs-exact verdict
    assert(got.toSeq == Seq(("A", 2L, 2L, true), ("B", 1L, 1L, true)))
  }
}
