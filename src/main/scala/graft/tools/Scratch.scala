package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage instrumentation for perf work — not part of the surface. */
object Scratch {
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

    import org.apache.spark.sql.expressions.Window

    val sets = graft.operators.Dedup.wordSets(graft.Tables.documents(spark, dir))
    timed("sets.count")(println("sets=" + sets.count()))
    val tok = sets.select(col("doc_id"), col("source"), col("n"),
      explode(col("ws")).as("w"))
    timed("tok")(println("tok=" + tok.count()))
    val freq = tok.groupBy("w").agg(count(lit(1)).as("df"))
    timed("freq")(println("freq=" + freq.count()))
    val ranked = tok.join(freq, "w")
      .withColumn("rnk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("df"), col("w"))))
    val prefix = ranked
      .filter(col("rnk") <= col("n") - ceil(col("n") * 0.8) + 1)
      .select("doc_id", "source", "n", "w")
    timed("prefix")(println("prefix=" + prefix.count()))
    val a = prefix.select(col("source"), col("w"),
      col("doc_id").as("a_id"), col("n").as("na"))
    val b = prefix.select(col("source"), col("w"),
      col("doc_id").as("b_id"), col("n").as("nb"))
    val joined = a.join(b,
      col("a_id") < col("b_id") &&
        a("source") === b("source") && a("w") === b("w") &&
        col("nb") >= ceil(col("na") * 0.8) &&
        col("nb") <= floor(col("na") / 0.8))
    timed("selfjoin")(println("joined=" + joined.count()))
    val cands = joined.select("a_id", "b_id").distinct()
    timed("cands")(println("cands=" + cands.count()))
    timed("cands again")(println("cands=" + cands.count()))
    timed("full d4")(println("pairs=" +
      graft.operators.Dedup.ngramJaccard(spark, dir).count()))
    spark.stop()
  }
}
