package graft

import org.apache.spark.sql.DataFrame

/** Presentation-order seam for data-proportional outputs.
  *
  * Every query in the driver contract ends with a global `orderBy` so the
  * DuckDB oracle's row-order-sensitive hash compare is stable. For the
  * small aggregate outputs (a handful of rows whatever the input size)
  * that sort is free; for the pair lists and per-document frames whose
  * row count scales with the corpus (d2's candidate pairs, d6/d7's group
  * labels, m4's hamming pairs, …) a total order means one extra
  * range-partitioning Exchange over the full result — pure harness
  * overhead that a 100 TB production write would not want (partition-local
  * order, or no order, is what a parquet sink needs).
  *
  * `orderedBy` is `orderBy` behind the `spark.graft.orderedOutput` conf
  * (default true, preserving the driver contract): a production pipeline
  * sets the conf to false and every data-proportional output drops its
  * final global sort while small-aggregate queries keep theirs. The seam
  * is per-session and read at plan-construction time, so the same query
  * functions serve both the correctness harness and a scale run.
  */
object Output {
  val OrderedKey = "spark.graft.orderedOutput"

  /** Exact-vs-sketch seam for data-proportional distinct counts (default
    * false = exact, the oracle contract). A production session sets it to
    * true and x38's `count(DISTINCT text)` — the datasheet's one
    * data-proportional exchange — becomes `approx_count_distinct` (the q8
    * HLL++ path): the same frame, estimate columns instead of exact ones.
    */
  val ApproxDistinctKey = "spark.graft.approxDistinct"

  def approxDistinct(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.conf.get(ApproxDistinctKey, "false").equalsIgnoreCase("true")

  implicit class OutputOps(private val df: DataFrame) extends AnyVal {
    /** `orderBy(cols…)` when `spark.graft.orderedOutput` is unset or true
      * (the harness contract), identity when a production session sets it
      * to false — use for outputs whose row count scales with the corpus.
      */
    def orderedBy(first: String, rest: String*): DataFrame =
      // ordered unless EXPLICITLY false: a mistyped conf value must fall
      // back to the (safe, deterministic) harness contract, not throw at
      // plan time or silently drop the sort
      if (df.sparkSession.conf.get(OrderedKey, "true").equalsIgnoreCase("false")) df
      else df.orderBy(first, rest: _*)
  }
}
