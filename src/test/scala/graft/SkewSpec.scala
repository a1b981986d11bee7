package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Skew handling: the two defenses the engine relies on at fleet scale.
  *
  *  - AQE skew-join: a power-law key on the probe side of a sort-merge join
  *    is split into multiple tasks at runtime (no code change).
  *  - Salted two-phase aggregation (Analytics.saltedPurchaseTotals): the
  *    static answer for aggregations, proven equal to the plain groupBy in
  *    the oracle gate; here pinned against a deliberately skewed fixture.
  */
class SkewSpec extends SparkSpec {

  test("AQE splits a skewed sort-merge join at runtime") {
    import spark.implicits._
    // key 1L carries 100k rows; keys 2-2000 carry one row each. The payload
    // must be incompressible — shuffle sizes are compressed bytes, and a
    // constant string deflates below any skew threshold.
    val skewed = (Seq.fill(100000)(1L) ++ (2L to 2000L)).toDF("k")
      .withColumn("payload", concat(
        md5(concat(col("k"), monotonically_increasing_id())),
        md5(concat(col("k"), monotonically_increasing_id() + 1)),
        md5(concat(col("k"), monotonically_increasing_id() + 2)),
        md5(concat(col("k"), monotonically_increasing_id() + 3))))
    val dim = (1L to 2000L).map(i => (i, i * 10)).toDF("k", "v")

    val prev = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> spark.conf.getOption("spark.sql.adaptive.skewJoin.skewedPartitionFactor"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> spark.conf.getOption("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> spark.conf.getOption("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
      "spark.sql.adaptive.coalescePartitions.enabled" -> spark.conf.getOption("spark.sql.adaptive.coalescePartitions.enabled"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // local-scale thresholds so the 10 MB hot partition counts as skewed;
    // coalescing off so the skew rule (not the coalescer) owns the re-plan
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val joined = skewed.join(dim, "k")
      // collect() executes THIS plan, letting AQE materialize its re-plan
      // (count() would execute a separate derived plan)
      assert(joined.collect().length == 100000 + 1999)
      val adaptive = joined.queryExecution.executedPlan
        .collectFirst { case a: AdaptiveSparkPlanExec => a }
      assert(adaptive.isDefined, "expected an adaptive plan root")
      val finalPlan = adaptive.get.executedPlan.toString
      assert(finalPlan.contains("SortMergeJoin(skew=true)") &&
        finalPlan.contains("AQEShuffleRead skewed"),
        s"expected AQE to mark the hot partition as skewed, got:\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  // --- candidate-volume matrix -------------------------------------------
  // Numeric ceilings on CANDIDATE counts under crafted hot keys, so a guard
  // regression fails a unit test instead of a fleet. The d4 stopword bomb,
  // d5 hot-label bomb and g1 1000-leaf star live in DedupSpec with their
  // own count assertions; d2 and k2 are covered here.

  test("d2 bucket cap: 100 identical docs produce zero pairs, a planted dup still collides") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 100 byte-identical documents: every band bucket holds all 100, the
    // classic stop-shingle bomb that would cost C(100,2) = 4950 candidate
    // pairs per band. With the cap at 50 every bomb bucket is dropped
    // (recall on REAL near-dups is preserved by discriminating bands —
    // here the planted pair's buckets have size 2 and survive).
    val bomb = (1L to 100L).map(i =>
      (i, "all these tokens identical in every single document"))
    val planted = Seq(
      (201L, "p1 p2 p3 p4 p5 p6 p7 p8"),
      (202L, "p1 p2 p3 p4 p5 p6 p7 p8"))
    val sigs = (bomb ++ planted).toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.operators.Dedup.minHashSignature(
          array_distinct(split(col("text"), " ")), 32).as("sig"))
    try {
      val capped = graft.operators.Dedup
        .minhashCandidatePairs(sigs, numHashes = 32, bands = 8, maxBucketSize = 50)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(capped.toSet == Set((201L, 202L)),
        s"cap must drop the bomb buckets and keep the planted pair, got ${capped.toSet}")
      // without the cap the same fixture explodes — the volume the guard removes
      val uncapped = graft.operators.Dedup
        .minhashCandidatePairs(sigs, numHashes = 32, bands = 8, maxBucketSize = 100000)
        .count()
      assert(uncapped == 100L * 99 / 2 + 1,
        s"uncapped bomb should cost C(100,2)+1 candidates, got $uncapped")
    } finally CacheRegistry.releaseAll()
  }

  test("two-level cap: exact counts decide at the boundary, hash groups only flag") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // buckets of size cap (=3) must SURVIVE, size cap+1 must drop — the
    // exact-recount level decides, whatever the hash-group level flagged.
    // Three crafted buckets: A with 3 rows (at cap), B with 4 (over), C
    // with 1 — built directly as a banded frame.
    val rows = Seq.tabulate(3)(i => (i.toLong, 0, Seq(1L, 1L))) ++
      Seq.tabulate(4)(i => (10L + i, 0, Seq(2L, 2L))) ++
      Seq((20L, 0, Seq(3L, 3L)))
    val banded = rows.toDF("doc_id", "band", "bucket")
    val over = graft.operators.Dedup.overfullBuckets(banded, maxBucketSize = 3)
      .collect().map(r => (r.getInt(0), r.getSeq[Long](1)))
    assert(over.toSet == Set((0, Seq(2L, 2L))),
      s"only the size-4 bucket is over a cap of 3, got ${over.toSet}")
  }

  test("d8 incremental cap + batch restriction: bomb dropped, corpus never re-paired") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // Same stop-shingle bomb through the incremental path: ids 1..100
    // identical (ids % 10 == 0 are the "new batch"), a planted
    // batch-vs-corpus pair (205, 210) and a planted corpus-internal pair
    // (203, 207). The cap must drop the bomb buckets; the batch predicate
    // must keep the corpus-internal pair out at ANY cap.
    val dir = java.nio.file.Files.createTempDirectory("graft-skew-d8").toString
    val bomb = (1L to 100L).map(i =>
      (i, "all these tokens identical in every single document"))
    val planted = Seq(
      (205L, "p1 p2 p3 p4 p5 p6 p7 p8"), (210L, "p1 p2 p3 p4 p5 p6 p7 p8"),
      (203L, "q1 q2 q3 q4 q5 q6 q7 q8"), (207L, "q1 q2 q3 q4 q5 q6 q7 q8"))
    (bomb ++ planted).map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$dir/documents.parquet")
    try {
      val capped = graft.operators.Dedup
        .incrementalDedup(spark, dir, minEstJaccard = 0.0, maxBucketSize = 50)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(capped.toSet == Set((205L, 210L)),
        s"cap drops the bomb, batch predicate drops (203,207), got ${capped.toSet}")
      CacheRegistry.releaseAll()
      // uncapped: bomb pairs with >= 1 new side = C(100,2) - C(90,2) = 945,
      // plus the planted batch pair; the 90*89/2 corpus-internal bomb pairs
      // and (203,207) stay excluded by the batch-side join alone
      val uncapped = graft.operators.Dedup
        .incrementalDedup(spark, dir, minEstJaccard = 0.0, maxBucketSize = 100000)
        .count()
      assert(uncapped == 945L + 1,
        s"uncapped incremental volume must be batch-sided (946), got $uncapped")
    } finally CacheRegistry.releaseAll()
  }

  test("k2 cluster blocking keeps the pair join at within-cluster volume") {
    import spark.implicits._
    val dim = 8
    // 100 vectors in 4 tight orthogonal clusters of 25; ids 0-3 are one
    // per cluster, so the deterministic lowest-id seeds land one per
    // cluster and the argmax assignment recovers the planted partition.
    def vec(cluster: Int, i: Long): Array[Float] = {
      val v = Array.fill(dim)(0.001f * ((i % 7) + 1))
      v(cluster) = 1.0f
      v
    }
    val emb = (0L until 100L).map(i => (i, vec((i % 4).toInt, i), (i % 4).toInt))
      .toDF("vec_id", "embedding", "label")
    val dir = tempSfDir()
    emb.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    try {
      // minCosine = -1 keeps every candidate, so the row count IS the
      // post-blocking candidate volume: 4 * C(25,2) = 1200, not C(100,2)
      val volume = graft.operators.Curation
        .semDedupPairs(spark, dir, k = 4, minCosine = -1.0).count()
      assert(volume == 4L * 25 * 24 / 2,
        s"expected within-cluster volume 1200, got $volume (all-pairs would be 4950)")
    } finally CacheRegistry.releaseAll()
  }

  test("salted two-phase aggregation equals plain groupBy on a skewed key") {
    import spark.implicits._
    val dir = tempSfDir()
    // user 7 is the power-law key: 50k purchases; 100 other users, 10 each
    val rows =
      (1 to 50000).map(i => (i.toLong, 7L)) ++
        (1 to 1000).map(i => (100000L + i, (i % 100).toLong + 100L))
    rows.map { case (id, u) =>
      (id, new java.sql.Timestamp(1700000000000L + id), u, "purchase",
        (id % 97).toDouble, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val salted = graft.operators.Analytics.saltedPurchaseTotals(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val plain = graft.Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(sum(col("value").cast("decimal(12,2)")).cast("double").as("total_value"),
        count(lit(1)).as("n_purchases"))
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(salted.toSeq == plain.toSeq)
    assert(salted.find(_._1 == 7L).exists(_._3 == 50000L))
  }
}
