package graft

import java.nio.file.{Files, Paths}

import graft.operators.LinearRoad
import graft.sources.EventSources

/** Reference-exact VehicleTelematics reports, driven through the CSV
  * source with the reference's own input format.
  */
class LinearRoadSpec extends SparkSpec {

  /** Rows are (time,vid,spd,xway,lane,dir,seg,pos) like the reference CSV. */
  private def writeCsv(rows: Seq[String]): String = {
    val f = Files.createTempFile("cardata-", ".csv")
    Files.writeString(f, rows.mkString("\n"))
    f.toString
  }

  test("the reference's own accident_test_data.csv produces its expected reports") {
    // 8 reports of vid 3 at pos 139158, 30 s apart from t=870: the sliding
    // countWindow(4,1) emits from the 4th report on -> 5 rows, run start 870
    val cars = EventSources.carDataCsv(spark,
      "/root/reference/VehicleTelematics/input/accident_test_data.csv")
    val got = LinearRoad.accidents(cars).orderBy("time2").collect()
    assert(got.length == 5)
    assert(got.forall(_.getAs[Int]("time1") == 870))
    assert(got.map(_.getAs[Int]("time2")).toSeq == Seq(960, 990, 1020, 1050, 1080))
    assert(got.forall(r => r.getAs[Int]("vid") == 3 && r.getAs[Int]("pos") == 139158))
  }

  test("the reference's own data_small.csv runs all three reports consistently") {
    import org.apache.spark.sql.functions.col
    val cars = EventSources.carDataCsv(spark,
      "/root/reference/VehicleTelematics/input/data_small.csv")
    val fines = LinearRoad.speedFines(cars).collect()
    assert(fines.length == cars.filter(col("spd") >= 90).count().toInt)
    assert(fines.forall(_.length == 6)) // (time, vid, xway, seg, dir, spd)
    // independent accident expectation: a Scala fold over each vid's
    // time-ordered reports, emitting from the 4th consecutive same-pos on
    val expected = cars.select("vid", "time", "pos").collect()
      .groupBy(_.getAs[Int]("vid")).values.map { rows =>
        val sorted = rows.sortBy(_.getAs[Int]("time")).map(_.getAs[Int]("pos"))
        sorted.foldLeft((0, Option.empty[Int], 0)) {
          case ((emits, prev, runLen), pos) =>
            val len = if (prev.contains(pos)) runLen + 1 else 1
            (emits + (if (len >= 4) 1 else 0), Some(pos), len)
        }._1
      }.sum
    assert(LinearRoad.accidents(cars).count() == expected)
    LinearRoad.avgSpeedFines(cars).collect() // runs; 52->56 pairs may be absent
  }

  test("speed fines keep >=90 with the reference's column projection") {
    val path = writeCsv(Seq(
      "10,1,89,1,0,0,50,1000",
      "11,1,90,1,0,0,50,1100",
      "12,2,120,2,1,1,55,9000"))
    val got = LinearRoad.speedFines(EventSources.carDataCsv(spark, path))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(5)))
    assert(got.toSet == Set((11, 1, 90), (12, 2, 120)))
  }

  test("average speed control fines a 52->56 traversal over 60 mph") {
    // eastbound car 1: seg 52 at t=0 pos=0, seg 56 at t=100 pos=5280*... use
    // meters: 3000m in 100s = 30 m/s -> 30*3600/1000*0.621371 = 67 mph
    val path = writeCsv(Seq(
      "0,1,50,1,0,0,52,0",
      "100,1,50,1,0,0,56,3000",
      // car 2 is slow: 1000m in 100s = 10 m/s -> 22 mph, no fine
      "0,2,50,1,0,0,52,0",
      "100,2,50,1,0,0,56,1000"))
    val got = LinearRoad.avgSpeedFines(EventSources.carDataCsv(spark, path))
      .collect().map(r => (r.getInt(2), r.getInt(5)))
    assert(got.toSeq == Seq((1, 67)))
  }

  test("average speed control truncates the /1000 like the reference's int math") {
    // 31 m/s: (31*3600) div 1000 = 111; 111 * 0.621371 = 68.97 -> 68 mph.
    // Double division would read 111.6 * 0.621371 = 69.34 -> 69 (wrong).
    val path = writeCsv(Seq(
      "0,1,50,1,0,0,52,0",
      "100,1,50,1,0,0,56,3100"))
    val got = LinearRoad.avgSpeedFines(EventSources.carDataCsv(spark, path))
      .collect().map(r => (r.getInt(2), r.getInt(5)))
    assert(got.toSeq == Seq((1, 68)))
  }

  test("average speed control fine boundary: 27 m/s no fine, 28 m/s fined at 62") {
    // 27 m/s -> 97 * 0.621371 = 60.27 -> 60, NOT > 60 (no fine)
    // 28 m/s -> 100 * 0.621371 = 62.13 -> 62, fined
    val path = writeCsv(Seq(
      "0,1,50,1,0,0,52,0",
      "100,1,50,1,0,0,56,2700",
      "0,2,50,1,0,0,52,0",
      "100,2,50,1,0,0,56,2800"))
    val got = LinearRoad.avgSpeedFines(EventSources.carDataCsv(spark, path))
      .collect().map(r => (r.getInt(2), r.getInt(5)))
    assert(got.toSeq == Seq((2, 62)))
  }

  test("average speed control uses the extreme-position record per segment") {
    // eastbound: max pos wins per (vid, dir, seg): the seg-52 record at
    // pos=500/t=50 supersedes pos=0/t=0 -> 2500m in 50s = 50 m/s -> 111 mph
    val path = writeCsv(Seq(
      "0,1,50,1,0,0,52,0",
      "50,1,50,1,0,0,52,500",
      "100,1,50,1,0,0,56,3000"))
    val got = LinearRoad.avgSpeedFines(EventSources.carDataCsv(spark, path))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(5)))
    assert(got.toSeq == Seq((50, 100, 111)))
  }

  test("accidents emit one row per report from the 4th same-position report on") {
    val path = writeCsv(
      (0 until 6).map(i => s"${i * 30},7,0,1,0,0,20,555") :+ // 6 stopped reports
        "300,8,10,1,0,0,20,600")                             // moving car
    val got = LinearRoad.accidents(EventSources.carDataCsv(spark, path))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    // reports 4,5,6 (times 90,120,150) each emit with run start time1=0
    assert(got.toSet == Set((0, 90, 7), (0, 120, 7), (0, 150, 7)))
  }

  test("carDataAsEvents lets the generic stream operators run on telemetry") {
    val path = writeCsv(Seq("10,1,95,1,0,0,50,1000", "20,2,50,1,0,0,50,2000"))
    val events = EventSources.carDataAsEvents(EventSources.carDataCsv(spark, path))
    val radar = graft.streaming.StreamOps.speedRadar(events).collect()
    assert(radar.length == 1 && radar.head.getAs[Double]("value") == 95.0)
  }
}
