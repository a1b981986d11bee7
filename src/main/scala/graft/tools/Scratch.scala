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

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // cls1 scoring-rate probe: batch rate of scoreQuality over the
    // StreamBench staged input vs a single-kernel-eval pass
    val base = spark.read.parquet("/tmp/graft_stream_in")
    def textify(df: org.apache.spark.sql.DataFrame) = df.select(
      col("event_id").as("doc_id"), col("ts"),
      concat_ws(" ", col("event_type"),
        concat(lit("u"), pmod(col("user_id"), lit(50000))),
        concat(lit("g"), pmod(col("event_id"), lit(5000))),
        concat(lit("v"), floor(col("value")).cast("long")),
        concat(lit("a"), pmod(col("user_id"), lit(7))),
        concat(lit("b"), pmod(col("event_id"), lit(13))),
        concat(lit("c"), pmod(col("event_id"), lit(17))),
        concat(lit("d"), pmod(col("user_id"), lit(3))),
        lit("zz")).as("text"))
    val wq = Array.tabulate(65)(j => ((j * 2654435761L) % 2000001L) - 1000000L)
    val docs = textify(base).localCheckpoint()
    val n = docs.count()
    for (i <- 1 to 3) timed(s"score$i") {
      graft.operators.Curation.scoreQuality(docs, wq)
        .write.format("noop").mode("overwrite").save()
    }
    for (i <- 1 to 2) timed(s"kernel$i") {
      docs.select(col("doc_id"),
        graft.functions.Sketches.hashEmbedding(split(col("text"), " "), 64).as("e"))
        .select(col("doc_id"), element_at(col("e"), 1))
        .write.format("noop").mode("overwrite").save()
    }
    // two-step: embedding bound as an attribute, 64 element_at terms above
    for (i <- 1 to 3) timed(s"twostep$i") {
      val e = docs.select(col("doc_id"), col("ts"),
        graft.functions.Sketches.hashEmbedding(split(col("text"), " "), 64).as("__e"))
      val zTerms = (0 until 64).map { j =>
        floor(element_at(col("__e"), j + 1) * 1e6 + 0.5).cast("long") * lit(wq(j))
      } :+ lit(1000000L * wq(64))
      e.select(col("doc_id"), col("ts"), zTerms.reduceLeft(_ + _).as("z12"))
        .selectExpr("doc_id", "ts", "z12",
          "(least(greatest(z12 + 2000000000000, 0), 4000000000000) + 2000000) div 4000000 AS p6")
        .write.format("noop").mode("overwrite").save()
    }
    println("rows=" + n)
    spark.stop()
  }
}
