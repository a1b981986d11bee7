package graft.tools

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

import graft.operators.Curation
import graft.sinks.Sinks

/** The PipelineE2ESpec composition (dedup keep-list ∧ CCNet verdict ∧
  * token budget → reproducible training shards) driven at a SCALE slice —
  * the gate artifact that says the end-to-end pipeline's reproducibility
  * and shard discipline hold past fixture size, not just at sf0.001.
  * Runs the pipeline twice, asserts the loader contract (same partition
  * layout, same per-file row order, no dup docs, size bound, within-shard
  * sort), and writes a one-line JSON artifact.
  *
  *   sbt "runMain graft.tools.PipelineScale /tmp/sfx10b /root/repo/E2E_scale10.json 1500000 4096"
  */
object PipelineScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfx10b")
    val outJson = args.lift(1).getOrElse("E2E_scale.json")
    val budget = args.lift(2).map(_.toLong).getOrElse(1500000L)
    val maxRows = args.lift(3).map(_.toInt).getOrElse(4096)
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def shardFiles(root: Path): Seq[Path] =
      Files.walk(root).iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .toSeq.sortBy(_.toString)

    def run(out: String): Double = {
      val t0 = System.nanoTime()
      Sinks.writeShards(Curation.curatedCorpus(spark, dir, budget = budget),
        out, partitionCol = "source",
        sortCols = Seq("shuffle_key", "doc_id"), maxRecordsPerFile = maxRows)
      graft.CacheRegistry.releaseAll()
      graft.CacheRegistry.releaseShared()
      (System.nanoTime() - t0) / 1e9
    }

    def contents(out: String): Seq[(String, Seq[(Long, Long)])] =
      shardFiles(Paths.get(out)).map { f =>
        val rel = Paths.get(out).relativize(f).getParent.toString
        val rows = spark.read.parquet(f.toString)
          .select("doc_id", "shuffle_key").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq
        (rel, rows)
      }

    val base = Files.createTempDirectory("e2e-scale-").toString
    val sec1 = run(s"$base/r1")
    val sec2 = run(s"$base/r2")
    val c1 = contents(s"$base/r1")
    val c2 = contents(s"$base/r2")

    val total = graft.Tables.documents(spark, dir).count()
    val all = c1.flatMap(_._2)
    def check(cond: Boolean, what: String): Unit =
      if (!cond) { System.err.println(s"[e2e-scale] FAIL: $what"); sys.exit(1) }
    check(c1.map(_._1) == c2.map(_._1), "partition layout must reproduce")
    check(c1.map(_._2) == c2.map(_._2), "per-file row order must reproduce")
    check(all.nonEmpty, "pipeline must keep something")
    check(all.size < total, s"pipeline must drop something (${all.size}/$total)")
    check(all.map(_._1).distinct.size == all.size, "no doc written twice")
    c1.foreach { case (part, rows) =>
      check(rows.size <= maxRows, s"$part shard over maxRecordsPerFile")
      check(rows.map(_._2) == rows.map(_._2).sorted, s"$part not key-sorted")
    }
    val parts = c1.map(_._1).distinct.size
    val line =
      s"""{"dir":"$dir","docs_total":$total,"kept":${all.size},""" +
        s""""partitions":$parts,"files":${c1.size},"max_file_rows":$maxRows,""" +
        s""""budget":$budget,"reproducible":true,"sorted":true,""" +
        f""""sec_run1":$sec1%.1f,"sec_run2":$sec2%.1f}"""
    Files.write(Paths.get(outJson), (line + "\n").getBytes)
    println(s"E2ESCALE $line")
    spark.stop()
  }
}
