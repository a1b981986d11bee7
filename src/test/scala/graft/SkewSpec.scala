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
