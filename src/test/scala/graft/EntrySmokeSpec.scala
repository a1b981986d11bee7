package graft

/** CI-friendly fast gate: every SparkEntry query runs end-to-end at
  * sf0.001 and returns rows, and every oracle key points at a wired query.
  * Catches wiring/rename regressions without waiting for the driver's
  * sf0.01 oracle round.
  */
class EntrySmokeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without a query: $missing")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      assert(fn(spark, dir).count() > 0, s"$name returned no rows")
    }
  }
}
