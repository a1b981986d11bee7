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
