package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Dedup

/** Stage-by-stage timing probe for g1's degree-oriented wedge join. */
object G1Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val pairs = Dedup.sharedPairs(spark, dir, 0.8)
    println("PROBE npairs=" + t("pairs-count")(pairs.count()))
    val oriented =
      t("orient")(graft.CacheRegistry.persistTracked(Dedup.orientByDegree(pairs)))
    println("PROBE noriented=" + t("orient-count")(oriented.count()))
    val w = Dedup.wedgesOf(oriented)
    println("PROBE nwedges=" + t("wedges-count")(w.count()))
    val tri = Dedup.triangleCountsFromPairs(pairs)
    t("g1-noop")(tri.write.format("noop").mode("overwrite").save())
    t("g1-noop2")(tri.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
