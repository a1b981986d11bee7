package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Prints the formatted physical plan of one or more SparkEntry queries.
  *
  *   sbt "runMain graft.tools.Explain /root/testdata/sf0.01 d4_ngram_jaccard"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1)
    val builder = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // extra confs: SPARK_GRAFT_CONF="k1=v1,k2=v2" (the BenchSome knob) —
    // e.g. autoBroadcastJoinThreshold=-1 to dump the forced-shuffle plan
    sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(',')).map(_.split('=')).collect {
        case Array(k, v) => builder.config(k.trim, v.trim)
      }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"==== $name ====")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
