package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc d6 cost split: d4 chain vs CC iteration — perf work only. */
object D6Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm
    Seq("documents").foreach(t => spark.read.parquet(s"$dir/$t.parquet").count())
    (1 to 2).foreach { i =>
      timed(s"d4_pairs#$i") {
        graft.operators.Dedup.ngramJaccard(spark, dir).select("a_id", "b_id")
          .write.format("noop").mode("overwrite").save()
      }
      graft.CacheRegistry.releaseAll()
      timed(s"d6_total#$i") {
        graft.operators.Dedup.dedupGroups(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      graft.CacheRegistry.releaseAll()
    }
    spark.stop()
  }
}
