package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reference-exact VehicleTelematics reports on the reference's own CSV
  * schema `(time, vid, spd, xway, lane, dir, seg, pos)` — a user of the
  * reference can point these at the same input files and get the same
  * three CSVs. Batch expressions of the stream logic; the streaming twins
  * of the underlying state patterns live in graft.streaming.StreamOps.
  */
object LinearRoad {

  /** Report 1 — speeding fines: spd >= limit, project
    * (time, vid, xway, seg, dir, spd).
    * Reference: VehicleTelematics.java:59-83.
    */
  def speedFines(carData: DataFrame, limit: Int = 90): DataFrame =
    carData.filter(col("spd") >= limit)
      .select("time", "vid", "xway", "seg", "dir", "spd")

  /** Report 2 — average speed control between segments 52 and 56.
    *
    * Faithful to the reference (VehicleTelematics.java:93-152, 255-288):
    * per (vid, dir, seg∈{52,56}) keep the extreme-position record (max pos
    * eastbound dir=0, min pos westbound); pair each car's 52- and 56-records;
    * average speed in mph = ((Δpos intdiv Δt) * 3600 intdiv 1000) * 0.621371,
    * truncated to int. BOTH divisions are int/int in the reference
    * (VehicleTelematics.java:282): the /1000 TRUNCATES before the mile
    * factor, so e.g. 31 m/s reads 68 mph (111 * 0.621371), not 69
    * (111.6 * 0.621371). Fine when > 60.
    */
  def avgSpeedFines(carData: DataFrame): DataFrame = {
    val extremes = carData
      .filter(col("seg") === 52 || col("seg") === 56)
      .groupBy(col("vid"), col("dir"), col("seg"))
      .agg(
        when(first(col("dir")) === 0,
          max_by(struct(col("time"), col("pos"), col("xway")), struct(col("pos"), col("time"))))
          .otherwise(
            min_by(struct(col("time"), col("pos"), col("xway")), struct(col("pos"), col("time"))))
          .as("rec"))
      .select(col("vid"), col("dir"), col("seg"),
        col("rec.time").as("time"), col("rec.pos").as("pos"), col("rec.xway").as("xway"))

    val s52 = extremes.filter(col("seg") === 52)
      .select(col("vid"), col("dir"), col("xway"),
        col("time").as("time1"), col("pos").as("pos1"))
    val s56 = extremes.filter(col("seg") === 56)
      .select(col("vid"), col("dir"), col("xway").as("xway2"),
        col("time").as("time2"), col("pos").as("pos2"))

    s52.join(s56, Seq("vid", "dir"))
      .filter(col("time2") =!= col("time1"))
      // integer division first, exactly like the reference's int/int
      .withColumn("mps", expr("(pos2 - pos1) div (time2 - time1)"))
      .withColumn("avgspd",
        (expr("(mps * 3600) div 1000") * lit(0.621371)).cast("int"))
      .filter(col("avgspd") > 60)
      .select("time1", "time2", "vid", "xway", "dir", "avgspd")
  }

  /** Report 3 — accident detection: 4+ consecutive reports of one vehicle at
    * the same position; one output row per report from the 4th onward, with
    * time1 = run start, time2 = the current report (the reference's sliding
    * countWindow(4,1) emission pattern).
    * Reference: VehicleTelematics.java:162-172, 290-331.
    */
  def accidents(carData: DataFrame, minReports: Int = 4): DataFrame = {
    val byVid = Window.partitionBy("vid").orderBy("time")
    val byVidPos = Window.partitionBy("vid", "pos").orderBy("time")
    val runWindow = Window.partitionBy("vid", "pos", "run_id").orderBy("time")
    carData
      .withColumn("run_id",
        row_number().over(byVid) - row_number().over(byVidPos))
      .withColumn("idx_in_run", row_number().over(runWindow))
      .withColumn("time1", first(col("time")).over(runWindow))
      .filter(col("idx_in_run") >= minReports)
      .select(col("time1"), col("time").as("time2"),
        col("vid"), col("xway"), col("seg"), col("dir"), col("pos"))
  }
}
