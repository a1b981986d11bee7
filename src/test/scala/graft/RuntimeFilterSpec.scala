package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Runtime row-level join pruning — the third scale defense next to AQE
  * skew-split and salting (SkewSpec): when a selective dimension filter
  * feeds a shuffle join, Spark injects a bloom-filter semi-join
  * (`InjectRuntimeFilter`) so the FACT side drops non-joining rows at the
  * scan, before paying the shuffle. At 100 TB this is the difference
  * between shuffling the whole fact table and shuffling the ~matching
  * slice. The thresholds here are lowered only because the fixture is
  * tiny; production sizes cross the defaults on their own.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("a selective dim filter injects a bloom filter on the fact scan side") {
    import spark.implicits._
    val dir = tempSfDir()
    (1L to 50000L).map(i => (i % 1000, i)).toDF("k", "fact_payload")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/fact")
    (0L until 1000L).map(i => (i, s"dim_$i")).toDF("k", "dim_name")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/dim")

    val prev = Map(
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" ->
        spark.conf.getOption(
          "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"),
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" ->
        spark.conf.getOption(
          "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"))
    // force the shuffle-join path (no broadcast) and let the tiny fixture
    // qualify for filter injection
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    try {
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter(col("dim_name") === "dim_7")
      val joined = fact.join(dim, "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected an injected bloom-filter (might_contain) on the fact scan:\n$plan")
      // semantics unchanged by the runtime filter
      assert(joined.count() == 50)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
