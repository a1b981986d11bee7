package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup, TextAnalysis}
import graft.sinks.Sinks

/** The whole curation pipeline composed end-to-end on the real sf0.001
  * corpus: dedup keep-list ∧ CCNet language-model verdict ∧ token-budget
  * cut → reproducible training shards. This is the "a user could switch
  * their pipeline to this library" test: every stage is a production
  * operator (not a fixture special), the stages compose as keep-list
  * intersections on doc_id (the at-scale join pattern — verdict frames
  * are doc-keyed and tiny relative to the corpus), and the final artifact
  * is the shard layout a training loader consumes. Reproducibility is
  * asserted the way a loader needs it: same files, same per-file row
  * order, run to run.
  */
class PipelineE2ESpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def shardFiles(root: Path): Seq[Path] =
    Files.walk(root).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .toSeq.sortBy(_.toString)

  private def runPipeline(out: String): Unit =
    // the library composition CurationPipelineApp also runs — the spec and
    // the shipped job cannot drift apart
    Sinks.writeShards(Curation.curatedCorpus(spark, dir, budget = 1500L),
      out, partitionCol = "source",
      sortCols = Seq("shuffle_key", "doc_id"), maxRecordsPerFile = 8)

  test("curation pipeline composes to reproducible training shards") {
    val out1 = tempSfDir() + "/shards1"
    val out2 = tempSfDir() + "/shards2"
    runPipeline(out1)
    runPipeline(out2)

    def contents(out: String): Seq[(String, Seq[(Long, Long)])] =
      shardFiles(Paths.get(out)).map { f =>
        val rel = Paths.get(out).relativize(f).getParent.toString
        val rows = spark.read.parquet(f.toString)
          .select("doc_id", "shuffle_key").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq
        (rel, rows)
      }

    val c1 = contents(out1)
    val c2 = contents(out2)
    // same partition dirs, same per-file row ORDER, run to run (file names
    // carry task UUIDs, so compare by partition + content, not name)
    assert(c1.map(_._1) == c2.map(_._1), "partition layout must reproduce")
    assert(c1.map(_._2) == c2.map(_._2), "per-file row order must reproduce")

    val all = c1.flatMap(_._2)
    val total = Tables.documents(spark, dir).count()
    assert(all.nonEmpty, "pipeline must keep something")
    assert(all.size < total, s"pipeline must drop something (${all.size}/$total)")
    assert(all.map(_._1).distinct.size == all.size, "no doc written twice")
    // shard-size bound holds and the within-shard sort survived the writer
    c1.foreach { case (part, rows) =>
      assert(rows.size <= 8, s"$part shard over maxRecordsPerFile")
      assert(rows.map(_._2) == rows.map(_._2).sorted, s"$part not key-sorted")
    }
    // every stage actually cut: survivors are a strict subset of each
    // stage's own keep verdict (sanity that the intersection semantics
    // joined the right frames)
    val lmKept = TextAnalysis.ccnetBuckets(spark, dir)
      .filter(col("keep")).count()
    assert(all.size <= lmKept, "survivors exceed the CCNet keep set")
  }

  /** The round-13 WEB composition: p2's composed crawl-to-corpus verdict
    * (robots → URL dedup → extraction yield → the full content stack) as
    * the gate, budget-sampled and written through the same shard writer —
    * "a crawl operator could ship this library" in one artifact. The
    * budget is set high so the web FUNNEL is the binding stage and the
    * test pins its semantics, not the sampler's.
    */
  test("web pipeline composes to reproducible training shards") {
    def run(out: String): Unit =
      Sinks.writeShards(Curation.webCorpus(spark, dir, budget = 100000L),
        out, partitionCol = "source",
        sortCols = Seq("shuffle_key", "doc_id"), maxRecordsPerFile = 8)
    val out1 = tempSfDir() + "/web1"
    val out2 = tempSfDir() + "/web2"
    run(out1)
    run(out2)
    def contents(out: String): Seq[(String, Seq[Long])] =
      shardFiles(Paths.get(out)).map { f =>
        val rel = Paths.get(out).relativize(f).getParent.toString
        (rel, spark.read.parquet(f.toString)
          .select("doc_id").collect().map(_.getLong(0)).toSeq)
      }
    val c1 = contents(out1)
    val c2 = contents(out2)
    assert(c1 == c2, "web shard layout and row order must reproduce")
    val written = c1.flatMap(_._2)
    assert(written.nonEmpty, "web pipeline must keep something")
    assert(written.distinct.size == written.size, "no doc written twice")
    // survivors are exactly the p2 keepers that fit the (generous) budget:
    // the funnel is the binding stage on this corpus
    val p2Keep = Curation.webPipelineDecision(spark, dir)
      .filter(col("keep")).collect().map(_.getLong(0)).toSet
    assert(written.toSet.subsetOf(p2Keep), "a written doc escaped the p2 gate")
    assert(written.size < Tables.documents(spark, dir).count(),
      "web pipeline must drop something")
  }

  /** The round-9 composition: the quality-gated, split-assigned training
    * set written through the Z-ordered shard writer — classifier training
    * (cls1) → Pareto routing (cls2, curated sources pass outright) →
    * dedup ∧ CCNet ∧ budget ∧ leakage-proof split (x37, riding the same
    * memoShared d6 labels the dedup keep-list computed) →
    * Morton-clustered shards partitioned by split. Pins the same loader contract as the base
    * pipeline (reproducible layout + per-file byte order, no dup docs,
    * size bound) PLUS the cluster discipline: every file's rows are
    * ordered by the (q_bin, len_bin) Morton key with the doc_id
    * tie-break, which is what makes the Z-ordered write reproducible at
    * all (ties would otherwise land in task order).
    */
  test("classifier-gated split pipeline writes reproducible Z-ordered shards") {
    def runV2(out: String): Unit =
      Sinks.writeShardsZOrdered(Curation.curatedTrainingSet(spark, dir),
        out, partitionCol = "split", zorderCols = ("q_bin", "len_bin"),
        maxRecordsPerFile = 8, tieCols = Seq("doc_id"))
    val out1 = tempSfDir() + "/ts1"
    val out2 = tempSfDir() + "/ts2"
    runV2(out1)
    runV2(out2)

    def contents(out: String): Seq[(String, Seq[(Long, Long, Long)])] =
      shardFiles(Paths.get(out)).map { f =>
        val rel = Paths.get(out).relativize(f).getParent.toString
        val rows = spark.read.parquet(f.toString)
          .select(col("doc_id"),
            graft.functions.ZOrder.mortonKey(col("q_bin"), col("len_bin")).as("zk"),
            col("prob_micros"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        (rel, rows)
      }

    val c1 = contents(out1)
    val c2 = contents(out2)
    assert(c1.map(_._1) == c2.map(_._1), "partition layout must reproduce")
    assert(c1.map(_._2) == c2.map(_._2), "per-file row order must reproduce")

    // every exact-stratified split materializes as its own partition
    val parts = c1.map(_._1).distinct.sorted
    assert(parts == Seq("split=test", "split=train", "split=val"),
      s"all three splits must be written, got $parts")

    val all = c1.flatMap(_._2)
    val total = Tables.documents(spark, dir).count()
    assert(all.nonEmpty, "pipeline must keep something")
    assert(all.size < total, s"pipeline must drop something (${all.size}/$total)")
    assert(all.map(_._1).distinct.size == all.size, "no doc written twice")

    // survivors are exactly gated by the cls2 routing rule: curated
    // positive sources pass outright, bulk sources need the Pareto draw
    val gate = Curation.paretoFilter(spark, dir)
      .filter(col("keep") ||
        col("source").isin("src0", "src1", "src2", "src3", "src4"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(all.forall(r => gate(r._1)), "a doc escaped the quality gate")

    // shard-size bound + the TOTAL Morton cluster order inside every file
    c1.foreach { case (part, rows) =>
      assert(rows.size <= 8, s"$part shard over maxRecordsPerFile")
      val key = rows.map(r => (r._2, r._1))
      assert(key == key.sorted, s"$part not Morton-clustered with tie-break")
    }
  }
}
