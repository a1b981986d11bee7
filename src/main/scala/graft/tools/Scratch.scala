package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage instrumentation for perf work — not part of the surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set(graft.Output.OrderedKey, "false")

    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    import graft.operators.Curation

    val pareto = Curation.paretoFilter(spark, dir)
    val kept = pareto.filter(col("keep"))
    println(s"PARETO total=${pareto.count()} kept=${kept.count()}")
    pareto.groupBy((col("prob_micros") / 100000).cast("int").as("p_decile"))
      .agg(count(lit(1)).as("n"), sum(col("keep").cast("long")).as("kept"))
      .orderBy("p_decile").show(20, false)

    val base = Curation.curatedCorpus(spark, dir, budget = 1500L)
    println(s"CURATED base=${base.count()}")
    val ts = Curation.curatedTrainingSet(spark, dir)
    println(s"TRAININGSET=${ts.count()}")
    ts.groupBy("split").count().show()
    ts.groupBy("q_bin").count().orderBy("q_bin").show(30)

    spark.stop()
  }
}
