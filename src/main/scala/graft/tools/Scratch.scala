package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage instrumentation for perf work — not part of the surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfx100")
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

    // d2 stage breakdown at the given slice
    val docs = graft.CacheRegistry.persistTracked(
      graft.Tables.documents(spark, dir)
        .filter(size(split(col("text"), " ")) >= 1)
        .select(col("doc_id"),
          graft.operators.Dedup.minHashSignature(
            array_distinct(split(col("text"), " ")), 32).as("sig")))
    timed("1 signature kernel")(println("docs=" + docs.count()))
    val pairs = graft.operators.Dedup.minhashCandidatePairs(docs, 32, 8, 2000)
    timed("2 banded candidates+distinct")(println("cands=" + pairs.count()))
    val cached = graft.CacheRegistry.persistTracked(pairs)
    timed("2b cache pairs")(println("cands=" + cached.count()))
    val scored = cached
      .join(docs.select(col("doc_id").as("a_id"), col("sig").as("a_sig")), "a_id")
      .join(docs.select(col("doc_id").as("b_id"), col("sig").as("b_sig")), "b_id")
      .select(col("a_id"), col("b_id"),
        (graft.functions.Sketches.equalCount(col("a_sig"), col("b_sig"))
          .cast("double") / 32).as("est_jaccard"))
      .filter(col("est_jaccard") >= 0.8)
    timed("3 sig rejoin+score")(println("pairs=" + scored.count()))
    timed("4 full d2 fresh")(println("pairs=" +
      graft.operators.Dedup.minhashLsh(spark, dir).count()))
    spark.stop()
  }
}
