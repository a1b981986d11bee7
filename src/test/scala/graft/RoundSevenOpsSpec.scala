package graft

import org.apache.spark.sql.SaveMode

import graft.operators.{Curation, Decontamination, Dedup, Similarity, TextAnalysis}

/** Semantics of the round-7 pipeline operators on crafted fixtures:
  * fraction-based decontamination thresholds (c2), BM25 scoring and the
  * top-k cut (i2), the deterministic corpus permutation (x30), mixture
  * token-budget sampling vs the naive global-prefix rule (x31),
  * interpolated bigram LM scoring (x32), and cluster separation margins
  * (k4).
  */
class RoundSevenOpsSpec extends SparkSpec {

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = tempSfDir()
    rows.map { case (id, text, source) => (id, text, "en", source, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    dir
  }

  private def writeEmbeddings(rows: Seq[(Long, Seq[Float], Int)]): String = {
    import spark.implicits._
    val dir = tempSfDir()
    rows.toDF("vec_id", "embedding", "label")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/embeddings.parquet")
    dir
  }

  /** The x30/x31 permutation key, reimplemented independently. */
  private def permKey(id: Long): Long = {
    val r1 = (java.lang.Math.floorMod(id, 2147483648L) * 1103515245L + 12345L) % 2147483648L
    val x = r1 ^ (r1 / 32768L)
    (x * 69069L + 1234567L) % 2147483648L
  }

  test("c2 grades contamination by shingle fraction; zero-overlap docs keep a row") {
    val bench = "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10" // 3 distinct 8-shingles
    val copy = bench // full eval copy: frac 1.0
    // 13 tokens -> 6 shingles, exactly one of them (b2..b9) in the bench
    // set: 1*5 < 6, so a hit that stays under the 20% threshold
    val touch = "x1 b2 b3 b4 b5 b6 b7 b8 b9 x2 x3 x4 x5"
    val clean = "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"
    val dir = writeDocs(Seq(
      (1L, bench, "src0"), (10L, touch, "s1"), (11L, clean, "s1"),
      (12L, copy, "s1")))
    val got = Decontamination.contaminationFraction(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getDouble(4), r.getBoolean(5)))
    assert(got.toSeq == Seq(
      (10L, 6L, 1L, 0.166667, false),
      (11L, 3L, 0L, 0.0, false),
      (12L, 3L, 3L, 1.0, true)), s"got ${got.toSeq}")
  }

  test("i2 BM25 ranks higher-tf/shorter docs first and drops docs with no query term") {
    // terms: spark (df 2), join (df 1); window absent everywhere
    val dir = writeDocs(Seq(
      (1L, "spark spark join x1 x2", "s0"), // dl 5
      (2L, "spark y1 y2 y3 y4 y5 y6 y7 y8 y9", "s0"), // dl 10
      (3L, "z1 z2 z3 z4", "s0"))) // no hit -> absent
    val rows = TextAnalysis.bm25TopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == Seq(1L, 2L), s"got ${rows.toSeq}")
    assert(rows(0)._2 == 2L && rows(1)._2 == 1L)
    // independent score: the op's exact arithmetic (round-9 contributions,
    // exact decimal sum, round 4)
    def contrib(tf: Long, df: Long, dl: Long, nDocs: Long, totDl: Long): BigDecimal = {
      val idf = math.log((nDocs.toDouble - df + 0.5) / (df.toDouble + 0.5) + 1.0)
      val c = idf * (tf.toDouble * 2.2) /
        (tf.toDouble + 1.2 * (0.25 + 0.75 * (dl.toDouble * nDocs / totDl)))
      BigDecimal(c).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }
    val d1 = (contrib(2, 2, 5, 3, 19) + contrib(1, 1, 5, 3, 19))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows(0)._3 == d1, s"doc1 bm25 ${rows(0)._3} != $d1")
  }

  test("x30 is a deterministic permutation: every doc once, contiguous shard positions") {
    val dir = writeDocs((0L until 64L).map(i => (i, s"w$i text", s"s${i % 3}")))
    val got = Curation.corpusShuffle(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(got.map(_._3).sorted.toSeq == (0L until 64L), "not a permutation")
    got.groupBy(_._1).foreach { case (shard, rows) =>
      assert(shard >= 0 && shard < 16)
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length), s"shard $shard positions")
      // within a shard, position order == (key, id) order
      val byPos = rows.sortBy(_._2).map(r => (r._4, r._3))
      assert(byPos.sorted.toSeq == byPos.toSeq, s"shard $shard not key-ordered")
    }
    // key formula matches the independent reimplementation
    got.foreach { case (shard, _, id, key) =>
      assert(key == permKey(id), s"doc $id key")
      assert(shard == (key / 65536L) % 16L, s"doc $id shard")
    }
  }

  test("x31 two-phase bucket sampling equals the naive global-prefix rule") {
    val docs = (0L until 40L).map { i =>
      val wc = 3 + (i % 7) // token counts 3..9
      (i, (1L to wc).map(j => s"t${i}_$j").mkString(" "), s"s${i % 2}")
    }
    val dir = writeDocs(docs)
    val budget = 60L
    val got = Curation.tokenBudgetSample(spark, dir, budget = budget)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(4), r.getBoolean(5)))
    // naive rule, computed independently: per source in (pri, id) order,
    // keep while the running token total stays within budget
    val naive = docs
      .map { case (id, text, src) =>
        (id, src, text.split(" ").length.toLong, permKey(id))
      }
      .groupBy(_._2).flatMap { case (_, rows) =>
        val sorted = rows.sortBy(r => (r._4, r._1))
        val cums = sorted.scanLeft(0L)(_ + _._3).tail
        sorted.zip(cums).map { case ((id, src, wc, _), cum) =>
          (id, src, wc, cum, cum <= budget)
        }
      }.toSet
    assert(got.toSet == naive, s"two-phase != naive")
    // the budget boundary actually cuts: some kept, some dropped, per source
    Seq("s0", "s1").foreach { s =>
      val in = got.filter(_._2 == s)
      assert(in.exists(_._5) && in.exists(!_._5), s"$s boundary never cut")
    }
  }

  test("x32 interpolated bigram logprob matches hand-computed mixture") {
    // uni: a=3 b=2 c=1, T=6; bigrams: (a,b) x2, (a,c) x1
    val dir = writeDocs(Seq(
      (1L, "a b", "s0"), (2L, "a b", "s0"), (3L, "a c", "s0")))
    val got = TextAnalysis.bigramLogProb(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val lam = 0.7
    def lp(bc: Long, uc1: Long, uc2: Long): Double =
      math.log(lam * (bc.toDouble / uc1) + (1.0 - lam) * (uc2.toDouble / 6.0))
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.toSeq == Seq(
      (1L, 1L, r4(lp(2, 3, 2))),
      (2L, 1L, r4(lp(2, 3, 2))),
      (3L, 1L, r4(lp(1, 3, 1)))), s"got ${got.toSeq}")
  }

  test("k4 margins: separated cluster scores 1, tie vector margins 0 toward smaller id") {
    val dir = writeEmbeddings(Seq(
      (0L, Seq(1f, 0f), 0), // centroid 0
      (1L, Seq(0f, 1f), 0), // centroid 1
      (2L, Seq(1f, 1f), 0))) // equidistant: tie -> cluster 0, margin 0
    val got = Curation.clusterQuality(spark, dir, k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      // cluster 0: v0 (cos 1, margin 1) + v2 (cos .707107, margin 0)
      (0L, 2L, 0.853554, 0.5, 0.0, 0L),
      // cluster 1: its centroid vector only
      (1L, 1L, 1.0, 1.0, 1.0, 1L)), s"got ${got.toSeq}")
  }

  test("g2 one PageRank superstep on a path graph matches hand-run integer arithmetic") {
    import spark.implicits._
    // path 1-2-3: deg 1/2/1, n=3, SCALE=1e12
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a_id", "b_id")
    val got = Dedup.pageRankFromPairs(pairs, iters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // base = (15 * (1e12 div 3)) div 100 = 49999999999 (the .95 truncates);
    // v2's contribution 333333333333 div 2 = 166666666666 (the .5 truncates)
    assert(got.toSeq == Seq(
      (1L, 1L, 191666666665L, 191666666665L / 1.0e12),
      (2L, 2L, 616666666665L, 616666666665L / 1.0e12),
      (3L, 1L, 191666666665L, 191666666665L / 1.0e12)), s"got ${got.toSeq}")
    // three supersteps keep the hub on top and roughly conserve rank mass
    val pr3 = Dedup.pageRankFromPairs(pairs, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(pr3(2L) > pr3(1L) && pr3(1L) == pr3(3L), s"hub order $pr3")
    assert(math.abs(pr3.values.sum - 1000000000000L) < 1000000L, s"mass $pr3")
  }

  test("d9 weights each doc by the inverse of its transitive group size") {
    import spark.implicits._
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 3L)).toDF("doc_id", "group_id")
    val got = Dedup.dupWeightsFromLabels(labels)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, 1L, 2L, 0.5), (2L, 1L, 2L, 0.5), (3L, 3L, 1L, 1.0)), s"got ${got.toSeq}")
  }

  test("s6 radius search returns all above-threshold hits in probed cells only") {
    // cells seeded by vec 0/1; v5 lands in cell 0, v6 in cell 1, and the
    // antipodal v7 in cell 1 (cos 0 beats cos -1). nProbe=1: q0 sees only
    // cell 0, q1 only cell 1; v7 survives probing but fails the radius.
    val dir = writeEmbeddings(Seq(
      (0L, Seq(1f, 0f, 0f, 0f), 0), (1L, Seq(0f, 1f, 0f, 0f), 0),
      (5L, Seq(10f, 1f, 0f, 0f), 0), (6L, Seq(0f, 10f, 1f, 0f), 0),
      (7L, Seq(-1f, 0f, 0f, 0f), 0)))
    val got = Similarity.rangeSearch(spark, dir, minCosine = 0.3,
        kCells = 2, nProbe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val c = BigDecimal(10.0 / math.sqrt(101.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.toSeq == Seq((0L, 5L, c, 1L), (1L, 6L, c, 1L)), s"got ${got.toSeq}")
  }

  test("x33 cuts each language's logprob ranking into head/middle/tail tertiles") {
    import spark.implicits._
    // single lang, 3 docs with strictly ordered fluency
    val dir = writeDocs(Seq(
      (1L, "the the the", "s0"),
      (2L, "the the rare1", "s0"),
      (3L, "rare2 rare3 rare4", "s0")))
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lp5 = math.log(5.0 / 9.0); val lp1 = math.log(1.0 / 9.0)
    val got = TextAnalysis.ccnetBuckets(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(3), r.getLong(4),
        r.getString(5), r.getBoolean(6)))
    assert(got.toSeq == Seq(
      (1L, r4(lp5), 1L, "head", true),
      (2L, r4((2 * lp5 + lp1) / 3.0), 2L, "middle", true),
      (3L, r4(lp1), 3L, "tail", false)), s"got ${got.toSeq}")
    // languages rank independently: 2 docs per lang -> buckets 1,2, no tail
    val dir2 = tempSfDir()
    Seq((10L, "en en en", "en", "s0", 8L), (11L, "en rare", "en", "s0", 7L),
        (20L, "fr fr fr", "fr", "s0", 8L), (21L, "fr rare2", "fr", "s0", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir2/documents.parquet")
    val got2 = TextAnalysis.ccnetBuckets(spark, dir2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(4)))
    assert(got2.toSeq == Seq(
      (10L, "en", 1L), (11L, "en", 2L), (20L, "fr", 1L), (21L, "fr", 2L)),
      s"got ${got2.toSeq}")
  }

  test("g2 matches an independent integer PageRank on random graphs") {
    import spark.implicits._
    // pure-Scala reference with the same integer contract: SCALE div n
    // init, contributions pr div deg, update (15*(SCALE div n)) div 100 +
    // (85*sum) div 100 — any divergence in the distributed version's join
    // or aggregation structure shows up as a value diff
    def reference(pairs: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
      val edges = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      val deg = edges.groupBy(_._1).map { case (v, es) => v -> es.size.toLong }
      val n = deg.size.toLong
      val base = (15L * (1000000000000L / n)) / 100L
      var pr: Map[Long, Long] = deg.map { case (v, _) => v -> 1000000000000L / n }
      (1 to iters).foreach { _ =>
        val in = edges.groupBy(_._2).map { case (v, es) =>
          v -> es.map { case (src, _) => pr(src) / deg(src) }.sum
        }
        pr = pr.map { case (v, _) => v -> (base + (85L * in(v)) / 100L) }
      }
      pr
    }
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { trial =>
      val nV = 6 + rnd.nextInt(10)
      val pairs = (0 until nV * 2).map { _ =>
        val a = rnd.nextInt(nV).toLong; val b = rnd.nextInt(nV).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      if (pairs.nonEmpty) {
        val got = Dedup.pageRankFromPairs(pairs.toDF("a_id", "b_id"), iters = 3)
          .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
        val want = reference(pairs, 3)
        assert(got == want, s"trial $trial: $got != $want")
      }
    }
  }

  test("g2 auto mode runs supersteps to convergence and stops early") {
    import spark.implicits._
    // a graph with structure (hub + path + triangle) so ranks take a few
    // supersteps to settle but converge well before the 50-cap
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (2L, 5L),
      (5L, 6L), (6L, 7L), (7L, 5L)).toDF("a_id", "b_id")
    val (auto, used) = Dedup.pageRankFromPairsAuto(pairs)
    val got = auto.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(used < 100, s"must converge before the iteration cap, ran $used")
    assert(used % 3 == 0, s"supersteps run in probe blocks of 3, got $used")
    // the auto loop's supersteps are the SAME integer map as the fixed
    // loop's: a fixed run of the same length lands bit-identically
    val fixedSame = Dedup.pageRankFromPairs(pairs, iters = used)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == fixedSame, "auto must equal a fixed run of equal length")
    // and it genuinely converged: three MORE supersteps move total rank
    // mass by less than the stop tolerance
    val further = Dedup.pageRankFromPairs(pairs, iters = used + 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val drift = got.map { case (v, pr) => math.abs(pr - further(v)) }.sum
    assert(drift <= 1000000L, s"post-convergence drift $drift")
  }

  test("k5 elbow: inertia is exact per rung and the delta tracks the drop") {
    // two perfect clusters on axes: k=1 leaves the e2 pair at cos 0
    // (inertia 2), k=2 covers both (inertia 0, delta 2)
    val dir = writeEmbeddings(Seq(
      (0L, Seq(1f, 0f), 0), (1L, Seq(0f, 1f), 0),
      (2L, Seq(1f, 0f), 0), (3L, Seq(0f, 1f), 0)))
    val got = Curation.elbowCurve(spark, dir, ks = Seq(1, 2))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1, 4L, 2.0, 0.0), (2, 4L, 0.0, 2.0)), s"got ${got.toSeq}")
    // on the real table the curve is monotone non-increasing in k
    val real = Curation.elbowCurve(spark, "/root/testdata/sf0.001")
      .collect().map(_.getDouble(2))
    assert(real.toSeq == real.sortBy(-_).toSeq, s"not monotone: ${real.toSeq}")
  }

  test("c3 scrubs exactly the benchmark-covered spans, keeps everything else") {
    val bench = "b1 b2 b3 b4 b5 b6 b7 b8"
    val dir = writeDocs(Seq(
      (1L, bench, "src0"),
      // hit at positions 2..9: those 8 tokens go, the flanks stay
      (10L, "x1 x2 b1 b2 b3 b4 b5 b6 b7 b8 y1 y2", "s1"),
      // hit at positions 0..7 only: the rotated shingle at position 1 is
      // NOT in the bench set, so the trailing lone b1 survives the scrub
      (11L, "b1 b2 b3 b4 b5 b6 b7 b8 b1 z9 z10", "s1"),
      (12L, "c1 c2 c3 c4 c5 c6 c7 c8 c9", "s1"),  // clean: untouched
      (13L, "short doc", "s1")))                   // under k: untouched
    val got = Decontamination.contaminationScrub(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getBoolean(4),
        r.getString(5)))
    assert(got.toSeq == Seq(
      (10L, 12L, 4L, true, "x1 x2 y1 y2"),
      (11L, 11L, 3L, true, "b1 z9 z10"),
      (12L, 9L, 9L, false, "c1 c2 c3 c4 c5 c6 c7 c8 c9"),
      (13L, 2L, 2L, false, "short doc")), s"got ${got.toSeq}")
  }

  test("s7 MMR demotes the near-duplicate runner-up below the orthogonal result") {
    // query 0 = e1. v5 and v6 are near-identical high-relevance vectors;
    // v7 is orthogonal (relevance 0). Pure relevance ranks (5, 6, 7); at
    // lambda=0.5 MMR picks 5, then the DIVERSE 7 (score 0 beats 6's
    // 0.5*rel - 0.5*~1 < 0), then 6.
    val dir = writeEmbeddings(Seq(
      (0L, Seq(1f, 0f, 0f, 0f), 0),
      (5L, Seq(10f, 1f, 0f, 0f), 0),
      (6L, Seq(10f, 1.0001f, 0f, 0f), 0),
      (7L, Seq(0f, 0f, 1f, 0f), 0)))
    val got = Similarity.mmrRerank(spark, dir, k = 3,
        lambda = 0.5, lambdaComp = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((0L, 1L, 5L), (0L, 2L, 7L), (0L, 3L, 6L)),
      s"got ${got.toSeq}")
    // sanity: pure relevance would have ranked the near-dup second
    val rel = Similarity.annTopK(spark, dir)
      .collect().map(r => (r.getLong(1))).take(3)
    assert(rel.toSeq == Seq(5L, 6L, 7L), s"relevance order ${rel.toSeq}")
  }

  test("x35 Gumbel keys replay independently; target-like docs dominate the sample") {
    import spark.implicits._
    val dir = tempSfDir()
    // 20 docs: even ids are English-marker docs (the DSIR target), odd ids
    // share no vocabulary with the target -> strongly negative weights
    (0L until 20L).map { i =>
      val (text, lang) =
        if (i % 2 == 0) (s"en_tok en_tok shared_$i", "en")
        else (s"xx_tok xx_tok only_$i", "xx")
      (i, text, lang, "s0", 10L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    val got = Curation.dsirResample(spark, dir, n = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3)))
    assert(got.length == 8)
    // keys match an independent reimplementation of LCG -> u -> Gumbel
    got.foreach { case (id, w, key) =>
      val bits = (java.lang.Math.floorMod(id, 2147483648L) * 1103515245L + 12345L) %
        2147483648L / 65536L % 32768L
      val u = (bits + 0.5) / 32768.0
      val expect = BigDecimal(w - math.log(-math.log(u)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(key == expect, s"doc $id key $key != $expect")
    }
    // selection is the key order, and the softmax-weighted draw favors the
    // target-like docs overwhelmingly (weights differ by several nats)
    assert(got.map(_._3).toSeq == got.map(_._3).sortBy(-_).toSeq, "not key-ordered")
    val enShare = got.count(_._1 % 2 == 0)
    assert(enShare >= 6, s"target-like docs under-sampled: $enShare/8")
  }

  test("i3 phrase search counts only ADJACENT in-order occurrences") {
    val dir = writeDocs(Seq(
      (1L, "the data the data", "s0"),   // 2 adjacent occurrences
      (2L, "the x data", "s0"),          // gap: no match
      (3L, "data the", "s0"),            // wrong order: no match
      (4L, "the data y", "s0")))         // 1 occurrence
    val got = TextAnalysis.phraseSearch(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("the data", 1L, 2L), ("the data", 4L, 1L)), s"got ${got.toSeq}")
  }

  test("x34 PMI ranks the exclusive collocation above the frequent-word pair") {
    // "new york": both words occur ONLY together (bc=5, uc 5/5);
    // "the a": same bc but "the" also appears alone (uc 10) -> lower PMI;
    // "a the" (bc=4) and "the the" (bc=4) fall below the min-count floor
    val dir = writeDocs(
      (1L to 5L).map(i => (i, "new york", "s0")) ++ Seq(
        (6L, "the a the a the a the a the a", "s0"),
        (7L, "the the the the the", "s0")))
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = TextAnalysis.pmiBigrams(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))
    // T=25: PMI(new york)=ln(5*25/25)=ln 5; PMI(the a)=ln(5*25/50)=ln 2.5
    assert(got.toSeq == Seq(
      ("s0", 1L, "new york", 5L, 5L, 5L, r4(math.log(5.0))),
      ("s0", 2L, "the a", 5L, 10L, 5L, r4(math.log(2.5)))), s"got ${got.toSeq}")
  }
}
