package graft

import org.apache.spark.sql.functions._

/** Bucketing: the co-located-join strategy for repeated large joins. Two
  * tables bucketed on the join key join with ZERO shuffle exchanges — at
  * 100 TB this converts every recurring fact⋈fact join from a full network
  * shuffle into local merges.
  */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables plans without a shuffle exchange") {
    import spark.implicits._
    (1L to 1000L).map(i => (i, s"left_$i")).toDF("k", "lv")
      .write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bkt_left")
    (1L to 1000L).map(i => (i, i * 2)).toDF("k", "rv")
      .write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bkt_right")

    // force a non-broadcast join so the shuffle-elision is what's tested
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle, got:\n$plan")
      assert(joined.count() == 1000)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
