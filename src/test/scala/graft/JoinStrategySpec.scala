package graft

import org.apache.spark.sql.functions._

/** Join-strategy steering: the hints an operator author reaches for when
  * Catalyst's size estimates are wrong at fleet scale (a "small" side that
  * is actually huge, or a join the stats can't see through). Each hint must
  * surface as its physical operator.
  */
class JoinStrategySpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("hints steer the physical join strategy") {
    import spark.implicits._
    val l = (1L to 1000L).map(i => (i, i * 2)).toDF("k", "lv")
    val r = (1L to 1000L).map(i => (i, i * 3)).toDF("k", "rv")

    val bcast = plan(l.join(broadcast(r), "k"))
    assert(bcast.contains("BroadcastHashJoin"), s"broadcast hint ignored:\n$bcast")

    val shash = plan(l.hint("shuffle_hash").join(r, "k"))
    assert(shash.contains("ShuffledHashJoin"), s"shuffle_hash hint ignored:\n$shash")

    val smerge = plan(l.hint("merge").join(r, "k"))
    assert(smerge.contains("SortMergeJoin"), s"merge hint ignored:\n$smerge")
  }

  test("hinted joins agree with each other on results") {
    import spark.implicits._
    val l = (1L to 100L).map(i => (i, i * 2)).toDF("k", "lv")
    val r = (50L to 150L).map(i => (i, i * 3)).toDF("k", "rv")
    val base = l.join(r, "k").collect().map(_.toSeq).toSet
    assert(l.hint("shuffle_hash").join(r, "k").collect().map(_.toSeq).toSet == base)
    assert(l.hint("merge").join(r, "k").collect().map(_.toSeq).toSet == base)
    assert(l.join(broadcast(r), "k").collect().map(_.toSeq).toSet == base)
    assert(base.size == 51)
  }
}
