package graft

import graft.functions.RollingHash

/** Pins the native rolling-hash expressions to a reference implementation
  * (verifying both the interpreted `nullSafeEval` path and the generated
  * code, since single-row projections may take either).
  */
class RollingHashSpec extends SparkSpec {

  private def polyRef(s: String): Long =
    s.getBytes("UTF-8").foldLeft(0L)((h, b) => h * 31L + (b & 0xffL))

  private def minWinRef(s: String, k: Int): Long = {
    val bytes = s.getBytes("UTF-8")
    if (bytes.length < k) polyRef(s)
    else bytes.sliding(k, 1).map(w =>
      w.foldLeft(0L)((h, b) => h * 31L + (b & 0xffL))).min
  }

  private def run(texts: Seq[String], k: Int = 8): Seq[(String, Long, Long)] = {
    import spark.implicits._
    texts.toDF("text")
      .select(
        org.apache.spark.sql.functions.col("text"),
        RollingHash.polyHash($"text").as("fp"),
        RollingHash.minWindowHash($"text", k).as("mw"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
  }

  test("poly hash matches the reference fold") {
    val texts = Seq("", "a", "hello world", "the quick brown fox", "ü≈ñîçøδé")
    run(texts).foreach { case (t, fp, _) => assert(fp == polyRef(t), s"text=$t") }
  }

  test("min window hash matches the naive all-windows minimum") {
    val texts = Seq("abcdefghijklmnop", "aaaaaaaaaaaa", "hello world again")
    run(texts, k = 4).foreach { case (t, _, mw) =>
      assert(mw == minWinRef(t, 4), s"text=$t")
    }
  }

  test("min window hash falls back to whole-text hash under one window") {
    run(Seq("abc"), k = 8).foreach { case (t, fp, mw) => assert(mw == fp) }
  }

  test("shared long runs give shared window hashes (near-dup signal)") {
    // Same 12-byte core embedded in different prefixes: the min over
    // windows of the core region is present in both window sets.
    val core = "zzzcommoncorezzz"
    val a = s"prefix one $core"
    val b = s"totally different lead-in $core"
    val winsA = a.getBytes("UTF-8").sliding(8, 1).map(w =>
      w.foldLeft(0L)((h, x) => h * 31L + (x & 0xffL))).toSet
    val winsB = b.getBytes("UTF-8").sliding(8, 1).map(w =>
      w.foldLeft(0L)((h, x) => h * 31L + (x & 0xffL))).toSet
    assert((winsA intersect winsB).nonEmpty)
  }
}
