package graft.tools

import org.apache.spark.sql.SparkSession

/** Sub-step timing probe for g2_pagerank: d4 pair build vs the PageRank
  * supersteps themselves. Usage: runMain graft.tools.G2Probe [sfDir]
  */
object G2Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val pairs = t("d4 pairs build + checkpoint") {
      val p = graft.operators.Dedup.sharedPairs(spark, dir, 0.8).localCheckpoint()
      println("PROBE pairs=" + p.count())
      p
    }
    (1 to 3).foreach { i =>
      val n = t(s"pagerank iters=$i") {
        graft.operators.Dedup.pageRankFromPairs(pairs, i).count()
      }
      println("PROBE rows=" + n)
    }
    // the bench call path: entry-map function + memo read + releaseAll
    (1 to 3).foreach { i =>
      t(s"bench-path run $i") {
        graft.operators.Dedup.pageRank(spark, dir).write
          .format("noop").mode("overwrite").save()
      }
      graft.CacheRegistry.releaseAll()
    }
    // convergence mode on the real dup graph: supersteps to the default
    // tolerance + agreement of the converged top ranks with a long fixed
    // run (sanity that the auto loop's checkpointed blocks compute the
    // same map at data scale, not just on the spec's crafted graph)
    val (auto, used) = t("pagerank auto-converge") {
      val r = graft.operators.Dedup.pageRankFromPairsAuto(pairs)
      (r._1.localCheckpoint(), r._2)
    }
    println(s"PROBE auto_supersteps=$used")
    val fixed = graft.operators.Dedup.pageRankFromPairs(pairs, used)
    val diff = auto.select("doc_id", "pr_micros")
      .exceptAll(fixed.select("doc_id", "pr_micros")).count()
    println(s"PROBE auto_vs_fixed_same_len_diff_rows=$diff")
  }
}
