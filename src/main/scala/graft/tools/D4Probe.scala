package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** d4 candidate-volume instrument (round-18 optimization work): prefix
  * frame sizes, pre-distinct candidate fanout, distinct candidates and
  * verified pairs, with wall times — the before/after evidence for prefix
  * filter changes. Not part of the surface.
  * Usage: runMain graft.tools.D4Probe [sfDir] [iters]
  */
object D4Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$dir/documents.parquet").count()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"D4PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to iters).foreach { i =>
      val sets = graft.operators.Dedup.wordSets(
        graft.Tables.documents(spark, dir))
      t(s"raw_fanout#$i") {
        println("D4PROBE raw_fanout=" +
          graft.operators.Dedup.jaccardCandidatesRaw(sets, 0.8).count())
      }
      graft.CacheRegistry.releaseAll()
      // prefix frame sizes: the long (⌈t·n⌉-complement) prefix both join
      // sides read through round 17, vs the asymmetric short prefix the
      // s-side reads from round 18 — the frame the candidate exchange
      // carries once past the broadcast threshold
      t(s"prefix_rows#$i") {
        val minJaccard = 0.8
        val tok = sets.select(col("doc_id"), col("n"), explode(col("ws")).as("w"))
        val freq = tok.groupBy("w").agg(count(lit(1)).as("df"))
        val ranked = tok.join(freq, "w")
          .withColumn("rnk", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("doc_id").orderBy(col("df"), col("w"))))
        val long = ranked
          .filter(col("rnk") <= col("n") - ceil(col("n") * minJaccard) + 1)
        val short = long.filter(col("rnk") <=
          col("n") - floor(col("n") * lit(2 * minJaccard / (1 + minJaccard))) + 1)
        println("D4PROBE long_prefix_rows=" + long.count() +
          " short_prefix_rows=" + short.count())
      }
      graft.CacheRegistry.releaseAll()
      // the round-17 SYMMETRIC prefix join (both sides the full
      // ⌈t·n⌉-complement prefix, a_id < b_id orientation), inlined here
      // so one binary measures both fanouts in one window
      t(s"sym_raw_fanout#$i") {
        val minJaccard = 0.8
        val tok = sets.select(col("doc_id"), col("source"), col("n"),
          explode(col("ws")).as("w"))
        val freq = tok.groupBy("w").agg(count(lit(1)).as("df"))
        val ranked = tok.join(freq, "w")
          .withColumn("rnk", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("doc_id").orderBy(col("df"), col("w"))))
        val prefix = graft.CacheRegistry.persistTracked(
          ranked
            .filter(col("rnk") <= col("n") - ceil(col("n") * minJaccard) + 1)
            .select("doc_id", "source", "n", "w", "rnk"))
        val a = prefix.select(col("source").as("a_source"), col("w").as("a_w"),
          col("doc_id").as("a_id"), col("n").as("na"), col("rnk").as("ra"))
        val b = prefix.select(col("source").as("b_source"), col("w").as("b_w"),
          col("doc_id").as("b_id"), col("n").as("nb"), col("rnk").as("rb"))
        val raw = a.join(b,
          col("a_id") < col("b_id") &&
            col("a_source") === col("b_source") && col("a_w") === col("b_w") &&
            col("nb") >= ceil(col("na") * minJaccard) &&
            col("nb") <= floor(col("na") / minJaccard) &&
            least(col("na") - col("ra"), col("nb") - col("rb")) + 1 >=
              ceil(lit(minJaccard / (1.0 + minJaccard)) * (col("na") + col("nb"))))
        println("D4PROBE sym_raw_fanout=" + raw.count())
      }
      graft.CacheRegistry.releaseAll()
      val cands = t(s"candidates#$i") {
        val c = graft.operators.Dedup.jaccardCandidates(sets, 0.8)
        println("D4PROBE distinct_candidates=" + c.count())
        c
      }
      t(s"scored#$i") {
        graft.operators.Dedup.ngramJaccard(spark, dir).write
          .format("noop").mode("overwrite").save()
      }
      graft.CacheRegistry.releaseAll()
      graft.CacheRegistry.releaseShared()
      val _ = cands
    }
    spark.stop()
  }
}
