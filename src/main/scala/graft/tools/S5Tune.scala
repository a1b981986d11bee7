package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.Similarity

/** Ad-hoc s5 stage timing/sweep for the round-8 codebook training work. */
object S5Tune {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val conf = args.lift(1).getOrElse("")
    val b = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    conf.split(";").filter(_.nonEmpty).map(_.split("=")).foreach(kv => b.config(kv(0), kv(1)))
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"S5STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      graft.CacheRegistry.releaseAll()
    }
    timed("warm") { Similarity.annIvfPq(spark, dir, trainIters = 1).write.format("noop").mode("overwrite").save() }
    timed("train0") { Similarity.annIvfPq(spark, dir, trainIters = 0).write.format("noop").mode("overwrite").save() }
    timed("train1") { Similarity.annIvfPq(spark, dir, trainIters = 1).write.format("noop").mode("overwrite").save() }
    timed("train3") { Similarity.annIvfPq(spark, dir, trainIters = 3).write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
