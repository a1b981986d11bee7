package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{RollingHash, Sketches, VectorFunctions}

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

  test("shingle-hash kernel matches xxhash64 of the concat_ws shingles") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // word soups incl. empty tokens from doubled spaces, short docs (< k
    // tokens -> empty result), and k boundary cases
    val word = Gen.oneOf("a", "bb", "ccc", "δδ", "w1", "x")
    val doc = Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    val texts = (sample(doc, 150) ++ Seq("", "a", "a b", "a  b c")).distinct
    for (k <- Seq(1, 2, 3, 8)) {
      val toks = split(col("text"), " ")
      // reference spelling: concat_ws over slice windows, then xxhash64
      // (sequence(1, 0) is DESCENDING in Spark, so guard the short case)
      val ref = when(size(toks) >= k,
        transform(sequence(lit(1), size(toks) - (k - 1)),
          i => xxhash64(concat_ws(" ", slice(toks, i, lit(k))))))
        .otherwise(array().cast("array<long>"))
      val got = texts.toDF("text")
        .select(col("text"),
          Sketches.shingleHash64(col("text"), k).as("kern"),
          ref.as("ref"))
        .collect()
      got.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"k=$k text='${r.getString(0)}'")
      }
    }
  }

  test("shingle-hit-starts and count-in-sorted-set match the explode+join spellings") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val word = Gen.oneOf("a", "bb", "ccc", "δδ", "w1", "x")
    val doc = Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    val texts = (sample(doc, 120) ++ Seq("", "a", "a b", "a  b c")).distinct
    for (k <- Seq(1, 2, 3)) {
      // reference set: every shingle hash of half the docs (so hits are
      // common but not universal), deduped and sorted — the exact set the
      // broadcast-join forms carried
      val df = texts.toDF("text")
      val half = texts.zipWithIndex.collect { case (t, i) if i % 2 == 0 => t }
      val set = half.toDF("text")
        .select(explode(Sketches.shingleHash64(col("text"), k)).as("h"))
        .distinct().collect().map(_.getLong(0))
      java.util.Arrays.sort(set)
      val got = df.select(col("text"),
        Sketches.shingleHitStarts(col("text"), k, set).as("starts"),
        Sketches.countInSortedSet(
          array_distinct(Sketches.shingleHash64(col("text"), k)), set)
          .as("cnt"),
        Sketches.shingleHash64(col("text"), k).as("hs"))
        .collect()
      val setS = set.toSet
      got.foreach { r =>
        val hs = r.getSeq[Long](3)
        val refStarts = hs.zipWithIndex.collect {
          case (h, i) if setS(h) => i }
        assert(r.getSeq[Int](1) == refStarts,
          s"starts k=$k text='${r.getString(0)}'")
        val refCnt = hs.distinct.count(setS)
        assert(r.getLong(2) == refCnt, s"cnt k=$k text='${r.getString(0)}'")
      }
    }
  }

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

  test("hash embedding matches the reference fold, unit norm, on generated docs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, split}
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.types.UTF8String
    val dim = 32
    def ref(tokens: Seq[String]): Array[Double] = {
      val acc = new Array[Double](dim)
      tokens.foreach { t =>
        var h = 0L
        t.getBytes("UTF-8").foreach(b => h = h * 31L + (b & 0xffL))
        h ^= h >>> 30
        h *= 0xbf58476d1ce4e5b9L
        h ^= h >>> 27
        h *= 0x94d049bb133111ebL
        h ^= h >>> 31
        acc(java.lang.Math.floorMod(h, dim.toLong).toInt) += (if (h < 0) -1.0 else 1.0)
      }
      val ss = acc.map(x => x * x).sum
      if (ss > 0) { val inv = 1.0 / math.sqrt(ss); acc.map(_ * inv) } else acc
    }
    val docs = sample(Gen.listOfN(20, Gen.identifier.map(_.take(8))), 100)
      .map(_.mkString(" ")).distinct
    val got = docs.toDF("text")
      .select(col("text"),
        graft.functions.Sketches.hashEmbedding(split(col("text"), " "), dim).as("emb"))
      .collect()
    got.foreach { r =>
      val expect = ref(r.getString(0).split(" ").toSeq)
      val emb = r.getSeq[Double](1).toArray
      assert(emb.toSeq == expect.toSeq, s"embedding mismatch for '${r.getString(0).take(30)}'")
      val norm = math.sqrt(emb.map(x => x * x).sum)
      assert(math.abs(norm - 1.0) < 1e-9, s"norm $norm not unit")
    }
  }

  test("count-in-set matches a filter fold, with multiplicity, on generated docs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, split}
    val words = Seq("the", "a", "of", "und", "la")
    val tokenGen = Gen.frequency(
      3 -> Gen.oneOf(words),
      7 -> Gen.identifier.map(_.take(6)))
    val docs = sample(Gen.listOfN(25, tokenGen), 100).map(_.mkString(" ")).distinct
    val got = docs.toDF("text")
      .select(col("text"),
        graft.functions.Sketches.countInSet(split(col("text"), " "), words).as("c"))
      .collect()
    got.foreach { r =>
      val expect = r.getString(0).split(" ").count(words.contains)
      assert(r.getLong(1) == expect, s"countInSet('${r.getString(0).take(30)}')")
    }
  }

  test("sorted intersect count equals set intersection size on generated sorted arrays") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val arr = Gen.listOfN(15, Gen.identifier.map(_.take(5)))
      .map(_.distinct.sorted.toArray)
    val pairs = sample(Gen.zip(arr, arr), 150)
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        graft.functions.Sketches.sortedIntersectCount(col("a"), col("b")).as("c"))
      .collect()
    got.zip(pairs).foreach { case (r, (a, b)) =>
      val expect = a.toSet.intersect(b.toSet).size.toLong
      assert(r.getLong(2) == expect,
        s"sortedIntersectCount(${a.take(3).mkString(",")}..., ${b.take(3).mkString(",")}...)")
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

  test("quantized-dot kernel equals the unrolled floor-sum spelling on generated vectors") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dim = 16
    // components across sign/magnitude regimes incl. exact .5e-6 grid edges
    val vec = Gen.listOfN(dim,
      Gen.chooseNum(-2000000, 2000000).map(_.toDouble / 1000000.0))
    val vecs = sample(vec, 200).map(_.toArray)
    val wq = Array.tabulate(dim + 1)(j => ((j * 2654435761L) % 2000001L) - 1000000L)
    val df = vecs.map(Tuple1(_)).toDF("e")
    val unrolled = ((0 until dim).map { j =>
      floor(element_at(col("e"), j + 1) * 1e6 + 0.5).cast("long") * lit(wq(j))
    } :+ lit(1000000L * wq(dim))).reduceLeft(_ + _)
    val got = df.select(
      functions.Sketches.quantizedDot(col("e"), wq.toSeq).as("kernel"),
      unrolled.as("unrolled")).collect()
    got.foreach { r =>
      assert(r.getLong(0) == r.getLong(1),
        s"kernel ${r.getLong(0)} != unrolled ${r.getLong(1)}")
    }
  }

  test("top-k aggregator equals global sort-take under arbitrary partition merges") {
    import graft.functions.TopKAggregator
    val agg = TopKAggregator.topK(5)
    val gen = for {
      n <- Gen.choose(0, 40)
      vs <- Gen.listOfN(n, Gen.choose(-5, 5).map(_.toDouble)) // dense ties
    } yield vs.zipWithIndex.map { case (v, i) => (v, i.toLong) }
    sample(gen, 60).zipWithIndex.foreach { case (rows, i) =>
      val ref = rows.sortBy { case (v, id) => (-v, id) }.take(5)
      // arbitrary split into partitions, reduce each, merge in order
      val splitAt = if (rows.isEmpty) 0 else (i * 7) % (rows.length + 1)
      val (p1, p2) = rows.splitAt(splitAt)
      val merged = agg.merge(
        p1.foldLeft(agg.zero)(agg.reduce),
        p2.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(merged) == ref, s"case $i: $rows")
    }
  }

  test("scd2 merge kernel is batch-split invariant on generated order streams") {
    // The streaming SCD2 apply's correctness claim: ANY micro-batch
    // partitioning of the same orders replays to the identical chained
    // history (decimal spend accumulates exactly; the merge kernel is
    // insert-only upsert + read-time chaining). Generate random order
    // sets, split them into 1-4 random batches, fold through scd2Merge,
    // and pin the chained result against the single-batch apply.
    import spark.implicits._
    import graft.streaming.StreamOps
    import org.apache.spark.sql.DataFrame
    val order = for {
      cust <- Gen.chooseNum(1L, 5L)
      year <- Gen.chooseNum(1995, 1999)
      // two-decimal prices, incl. values whose doubles don't sum cleanly
      cents <- Gen.chooseNum(1L, 99999L)
    } yield (cust, java.sql.Date.valueOf(s"$year-06-15"), cents / 100.0)
    def ordersDf(rows: Seq[(Long, java.sql.Date, Double)]): DataFrame =
      rows.toDF("o_custkey", "o_orderdate", "o_totalprice")
    def empty: DataFrame = StreamOps.scd2BatchDeltas(
      ordersDf(Seq.empty)).limit(0)
    def result(batches: Seq[Seq[(Long, java.sql.Date, Double)]]): Seq[(Long, Int, Option[Int], Boolean, Long, Double)] =
      StreamOps.scd2Chain(
        batches.foldLeft(empty)((st, b) =>
          StreamOps.scd2Merge(st, StreamOps.scd2BatchDeltas(ordersDf(b)))))
        .orderBy("o_custkey", "valid_from").collect()
        .map(r => (r.getLong(0), r.getInt(1),
          Option(r.get(2)).map(_.asInstanceOf[Int]), r.getBoolean(3),
          r.getLong(4), r.getDouble(5))).toSeq
    val cases = sample(Gen.chooseNum(3, 14).flatMap(n =>
      Gen.listOfN(n, order)), 6)
    cases.zipWithIndex.foreach { case (rows, i) =>
      assert(rows.nonEmpty, s"case $i generated no orders")
      val nBatches = 1 + (i % 4)
      val batches = rows.zipWithIndex
        .groupBy { case (_, j) => (j * 2654435761L) % nBatches }
        .toSeq.sortBy(_._1).map(_._2.map(_._1))
      val split = result(batches)
      val whole = result(Seq(rows))
      assert(split == whole,
        s"case $i ($nBatches batches): $split != $whole")
    }
  }
}
