package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.EventSources

/** Reference-exact YellowTaxi reports on the reference's own CSV layout
  * (`VendorID,tpep_pickup_datetime,tpep_dropoff_datetime,...,total_amount
  * [16],congestion_surcharge[17]`).
  */
object TaxiReports {

  /** CongestionArea (CongestionArea.java:33-76): trips with a congestion
    * surcharge, 1-day tumbling event-time window over the whole stream →
    * (day `yyyy/MM/dd`, trip count, avg total_amount rounded half-up to 2).
    *
    * Global windowAll in the reference = keyless day aggregate here; the
    * partial aggregation makes the "single global window" a non-bottleneck
    * at any parallelism.
    */
  def congestionArea(trips: DataFrame): DataFrame =
    trips
      .filter(col("congestion_surcharge") > 0.0)
      .groupBy(date_format(col("pickup_ts"), "yyyy/MM/dd").as("day"))
      .agg(
        count(lit(1)).cast("int").as("n_trips"),
        sum(col("total_amount").cast("decimal(18,2)")).as("amount_sum"))
      .select(col("day"), col("n_trips"),
        round(col("amount_sum").cast("double") / col("n_trips"), 2).as("avg_amount"))
      .orderBy("day")

  /** SaturatedVendor (SaturatedVendor.java:40-91): per vendor, consecutive
    * trip pairs (by pickup time) where the next pickup starts under 10
    * minutes after the previous dropoff → (vendor, pickup1, dropoff2, 2).
    *
    * Output times use the reference's `yyyy-MM-dd hh:mm:ss` format string —
    * NOTE `hh` is a 12-hour clock, faithfully reproducing the reference's
    * own formatting (SaturatedVendor.java:82).
    */
  def saturatedVendor(trips: DataFrame): DataFrame = {
    val byVendor = Window.partitionBy("vendor_id").orderBy("pickup_ts")
    trips
      .select(col("vendor_id"), col("pickup_ts"), col("dropoff_ts"))
      .withColumn("prev_dropoff", lag(col("dropoff_ts"), 1).over(byVendor))
      .withColumn("prev_pickup", lag(col("pickup_ts"), 1).over(byVendor))
      .filter(col("prev_dropoff").isNotNull &&
        unix_micros(col("pickup_ts")) - unix_micros(col("prev_dropoff")) < 600000000L)
      .select(
        col("vendor_id"),
        date_format(col("prev_pickup"), "yyyy-MM-dd hh:mm:ss").as("pickup1"),
        date_format(col("dropoff_ts"), "yyyy-MM-dd hh:mm:ss").as("dropoff2"),
        lit(2).as("n_trips"))
  }

  /** Parse the reference's taxi CSV into a typed frame. Malformed numeric
    * fields become 0.0 like the reference's NumberUtils.toDouble; a missing
    * column 17 becomes 0.0 as well.
    */
  def parseTaxiCsv(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.csv(path)
    val surcharge =
      if (raw.columns.contains("_c17")) coalesce(col("_c17").cast("double"), lit(0.0))
      else lit(0.0) // rows shorter than 18 fields, like the reference's guard
    raw.select(
      col("_c0").cast("int").as("vendor_id"),
      to_timestamp(col("_c1")).as("pickup_ts"),
      to_timestamp(col("_c2")).as("dropoff_ts"),
      coalesce(col("_c16").cast("double"), lit(0.0)).as("total_amount"),
      surcharge.as("congestion_surcharge"))
  }
}
