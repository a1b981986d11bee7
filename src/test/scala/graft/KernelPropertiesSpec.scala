package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{RollingHash, VectorFunctions}

/** Property-style pins for the native kernels using ScalaCheck generators
  * under fixed seeds (deterministic; no scalatest bridge needed): the
  * codegen'd expressions must agree with straightforward reference folds on
  * arbitrary input.
  */
class KernelPropertiesSpec extends SparkSpec {

  private def polyRef(s: String): Long =
    s.getBytes("UTF-8").foldLeft(0L)((h, b) => h * 31L + (b & 0xffL))

  private def minWinRef(s: String, k: Int): Long = {
    val bytes = s.getBytes("UTF-8")
    if (bytes.length < k) polyRef(s)
    else bytes.sliding(k, 1).map(_.foldLeft(0L)((h, b) => h * 31L + (b & 0xffL))).min
  }

  private def sample[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("poly and min-window hashes match reference folds on generated strings") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val texts = sample(
      Gen.oneOf(Gen.alphaNumStr, Gen.asciiPrintableStr, Gen.identifier), 200)
      .map(_.take(80)).distinct
    val got = texts.toDF("text")
      .select(col("text"),
        RollingHash.polyHash(col("text")).as("fp"),
        RollingHash.minWindowHash(col("text"), 5).as("mw"))
      .collect()
    assert(got.length == texts.length)
    got.foreach { r =>
      val t = r.getString(0)
      assert(r.getLong(1) == polyRef(t), s"polyHash(${t.take(20)}...)")
      assert(r.getLong(2) == minWinRef(t, 5), s"minWindowHash(${t.take(20)}...)")
    }
  }

  test("dot product matches a double fold and is symmetric on generated vectors") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val vec = Gen.listOfN(16, Gen.chooseNum(-100000, 100000).map(_.toFloat / 1000f))
    val pairs = sample(Gen.zip(vec, vec), 100)
      .map { case (a, b) => (a.toArray, b.toArray) }
    val got = pairs.toDF("a", "b")
      .select(
        VectorFunctions.dotD(col("a"), col("b")).as("ab"),
        VectorFunctions.dotD(col("b"), col("a")).as("ba"))
      .collect()
    got.zip(pairs).foreach { case (r, (a, b)) =>
      val ref = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + x.toDouble * y.toDouble
      }
      assert(r.getDouble(0) == ref)
      assert(r.getDouble(0) == r.getDouble(1), "dot must be symmetric")
    }
  }
}
