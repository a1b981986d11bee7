package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's recommended defaults, for users
  * embedding graft outside the driver contract. The knobs are the ones that
  * matter at fleet scale; every one can still be overridden afterwards.
  */
object GraftSession {

  /** @param shufflePartitions size to ~2-3x total executor cores on a real
    *                          cluster; the callers here pass the local core
    *                          count.
    */
  def builder(appName: String = "graft",
              master: Option[String] = None,
              shufflePartitions: Int = 200): SparkSession.Builder = {
    val b = SparkSession.builder()
      .appName(appName)
      // AQE: runtime re-plan for skew joins + partition coalescing
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      // the driver testdata carries INT64(NANOS) timestamps
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // graft SQL functions available out of the box
      .config("spark.sql.extensions", "graft.GraftSparkExtensions")
    master.fold(b)(b.master)
  }
}
