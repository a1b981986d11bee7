package graft

import java.sql.Timestamp

import org.apache.spark.sql.SaveMode

import graft.operators.Curation

/** Semantics of the curation operators on crafted fixtures: normalization
  * collapse rules (n1), the heavy-hitter share boundary (h1), and
  * deterministic centroid assignment with tie-breaking (k1).
  */
class CurationSpec extends SparkSpec {

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = tempSfDir()
    rows.map { case (id, text, source) => (id, text, "en", source, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    dir
  }

  test("n1 collapses case/punctuation/whitespace variants into one group") {
    val dir = writeDocs(Seq(
      (1L, "Hello, World!", "s0"),
      (2L, "hello   world", "s0"),
      (3L, "HELLO-WORLD", "s0"),
      (4L, "hello world", "s0"), // byte-identical to the normalized form
      (5L, "goodbye world", "s0")))
    val got = Curation.normalizedDedup(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 4L, 4L, 11L), // "hello world": 4 copies, 4 distinct raw spellings
      (5L, 1L, 1L, 13L)))
  }

  test("h1 share boundary is inclusive and totals are per event type") {
    import spark.implicits._
    val dir = tempSfDir()
    // type A: 10 events -> user 1 has 2 (share .2 >= .2 kept),
    //                      user 2 has 1 (share .1 dropped)
    // type B: 2 events  -> user 3 has 1 (share .5 kept)
    val rows =
      (1 to 2).map(i => (i.toLong, Timestamp.valueOf("2024-01-01 00:00:01"), 1L, "A", 1.0, "{}")) ++
      Seq((3L, Timestamp.valueOf("2024-01-01 00:00:02"), 2L, "A", 1.0, "{}")) ++
      (4 to 10).map(i => (i.toLong, Timestamp.valueOf("2024-01-01 00:00:03"), 9L, "A", 1.0, "{}")) ++
      Seq((11L, Timestamp.valueOf("2024-01-01 00:00:04"), 3L, "B", 1.0, "{}"),
        (12L, Timestamp.valueOf("2024-01-01 00:00:05"), 4L, "B", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/events.parquet")
    val got = Curation.heavyHitters(spark, dir, minShare = 0.2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("A", 1L, 2L, 0.2), ("A", 9L, 7L, 0.7),
      ("B", 3L, 1L, 0.5), ("B", 4L, 1L, 0.5)))
  }

  test("p1 reports the first failing rule in production order") {
    // "the the a fast ..." repeated markers -> en prediction, decent length
    val good = "the a fast w1 w2 w3 w4 w5 the a fast w6 w7 w8 w9 w10 " * 3
    val dir0 = writeDocs(Seq(
      (1L, good.trim, "s0"),            // keeper, passes everything
      (2L, good.trim.toUpperCase, "s0"), // same normalized text -> duplicate
      (3L, "the a", "s0"),              // 2 words -> length (before quality)
      (4L, "w w w w w w w w w w", "s0"))) // no markers, repetitive -> low quality
    // docs are written with lang="en" by the fixture helper
    // s0 as a positive-label source: the classifier stage passes these
    // docs outright, so the heuristic-stage expectations stay exact
    val got = Curation.pipelineDecision(spark, dir0, minWords = 5,
        maxWords = 1000, minQuality = 0.3, positiveSources = Seq("s0"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getString(2)))
    assert(got.toSeq == Seq(
      (1L, true, "ok"),
      (2L, false, "duplicate"),
      (3L, false, "length"),
      (4L, false, "low_quality")), s"got ${got.toSeq}")
  }

  test("p1 flags language disagreement last") {
    // strong es markers but the fixture labels the doc en
    val dir = writeDocs(Seq(
      (1L, "data table row data table row w1 w2 w3 w4 w5 w6", "s0")))
    val got = Curation.pipelineDecision(spark, dir, minQuality = 0.0,
      positiveSources = Seq("s0"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getString(2)))
    assert(got.toSeq == Seq((1L, false, "lang_mismatch")))
  }

  test("p1 composition: blocklist precedes dedup; contamination flags shingle overlap") {
    val bench = "the a fast alpha beta gamma delta eps zeta"
    val hit   = "the a fast alpha beta gamma delta eps omega"
    val dir = writeDocs(Seq(
      (1L, bench, "src0"), // benchmark-source doc, positive-label: ok
      (2L, hit, "src1"),   // shares an 8-shingle with doc 1 -> contaminated
      (3L, bench, "src7"))) // blocked domain fires BEFORE its duplicate reason
    val got = Curation.pipelineDecision(spark, dir, minQuality = 0.0)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(got == Map(
      1L -> "ok", 2L -> "contaminated", 3L -> "blocked_domain"), s"got $got")
  }

  test("p1 dedup keeper is the smallest SURVIVING copy, not a blocked one") {
    // the staged semantic: doc 1 (smallest id) is domain-blocked, so the
    // norm group's keeper is doc 2 — the content survives through its
    // first clean copy instead of being deleted outright
    val text = "the a fast alpha beta gamma delta eps zeta"
    val dir = writeDocs(Seq(
      (1L, text, "src7"),   // blocked domain, would be global-min keeper
      (2L, text, "s0"),     // smallest surviving copy -> keeper
      (3L, text, "s0")))    // duplicate of doc 2
    val got = Curation.pipelineDecision(spark, dir, minQuality = 0.0,
        positiveSources = Seq("s0"))
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(got == Map(
      1L -> "blocked_domain", 2L -> "ok", 3L -> "duplicate"), s"got $got")
  }

  test("p2 chains the fetch funnel before the content gates in production order") {
    val tB = "the a fast w1 w2 w3 w4 w5 the a fast w6 w7 w8 w9 w10 " * 3
    val tD = "the a fast v1 v2 v3 v4 v5 the a fast v6 v7 v8 v9 v10 " * 3
    val dir = writeDocs(Seq(
      // site1 disallows /a/b1 and the allow override /a/b12 does not
      // match -> never fetched, even though the text is fine
      (1L, tB.trim, "s0"),
      // /a/b23 hits BOTH rules of site2; the longer allow prefix wins
      // (REP longest-match) -> fetched, survives everything
      (23L, tB.trim, "s0"),
      // same canonical family as 23 (id % 100) -> the fetch queue never
      // requests it, whatever its text says
      (123L, "different words entirely here now", "s0"),
      // fetchable, but the page parses to zero content blocks
      (30L, "tiny", "s0"),
      // fetched fine, then the x42 domain blocklist fires
      (24L, tB.trim, "src7"),
      // canonical twin of 24 -> url_duplicate (24 is the allowed keeper)
      (124L, tD.trim, "s0"),
      // norm twin of 124: keeper, because 124 died at the URL stage —
      // the staged-keeper discipline across the frontier stages
      (225L, tD.trim, "s0")))
    val got = Curation.webPipelineDecision(spark, dir, minQuality = 0.3,
        positiveSources = Seq("s0"))
      .collect().map(r => (r.getLong(0), r.getString(3))).toMap
    assert(got == Map(
      1L -> "robots_disallowed", 23L -> "ok", 123L -> "url_duplicate",
      30L -> "no_content", 24L -> "blocked_domain",
      124L -> "url_duplicate", 225L -> "ok"), s"got $got")
  }

  test("p2 carries the canonical URL and the keep flag in the verdict frame") {
    val t = "the a fast w1 w2 w3 w4 w5 the a fast w6 w7 w8 w9 w10 " * 3
    val dir = writeDocs(Seq((30L, t.trim, "s0")))
    val got = Curation.webPipelineDecision(spark, dir, minQuality = 0.3,
        positiveSources = Seq("s0"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (30L, "https://site2.example.com/a/b30?lang=en&q=8", true, "ok")),
      s"got ${got.toSeq}")
  }

  test("x48 rolls p2 verdicts up into per-domain reputation rows") {
    val tB = "the a fast w1 w2 w3 w4 w5 the a fast w6 w7 w8 w9 w10 " * 3
    val tD = "the a fast v1 v2 v3 v4 v5 the a fast v6 v7 v8 v9 v10 " * 3
    // the p2 spec's fixture: site1 {1: robots}, site2 {23: ok,
    // 123: url_dup, 30: no_content}, site3 {24: blocked_domain,
    // 124: url_dup}, site4 {225: ok}
    val dir = writeDocs(Seq(
      (1L, tB.trim, "s0"), (23L, tB.trim, "s0"),
      (123L, "different words entirely here now", "s0"),
      (30L, "tiny", "s0"), (24L, tB.trim, "src7"),
      (124L, tD.trim, "s0"), (225L, tD.trim, "s0")))
    // domainProfile runs p2 at its production defaults, so fixture docs
    // that reach the content gates may land on any late reason — the
    // assertions below pin the FUNNEL-stage rows (decided before the
    // trained gates) plus the per-domain accounting invariants
    val got = Curation.domainProfile(spark, dir)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    val reasons = got.keySet
    assert(reasons.map(_._1) == Set("site1.example.com", "site2.example.com",
      "site3.example.com", "site4.example.com"), s"domains ${reasons.map(_._1)}")
    assert(got(("site1.example.com", "robots_disallowed"))._1 == 1L)
    // site2: three docs, one url_duplicate, one no_content, one that
    // reaches the content gates (whatever its final verdict)
    val site2 = got.filter(_._1._1 == "site2.example.com")
    assert(site2.values.map(_._1).sum == 3L, s"site2 $site2")
    assert(site2(("site2.example.com", "url_duplicate"))._1 == 1L)
    assert(site2(("site2.example.com", "no_content"))._1 == 1L)
    // totals and shares are per-domain and rounded at 6 (every site2
    // reason row counts exactly one doc of its three)
    site2.foreach { case (_, (n, total, _, _, share)) =>
      assert(n == 1L && total == 3L && share == 0.333333, s"site2 $site2")
    }
    assert(got(("site3.example.com", "blocked_domain"))._1 == 1L)
    assert(got(("site3.example.com", "url_duplicate"))._1 == 1L)
  }

  test("x49 FIM split: LCG selection, cut points and PSM/SPM re-serialization, pinned") {
    // expected values computed independently (python zlib.crc32 over the
    // re-serialized bytes; LCG chain u_k = (s_k >> 16) % 32768):
    // doc 1 u1 >= 16384 -> passthrough; doc 2 psm with an EMPTY middle
    // (b == a edge); doc 4 spm; doc 3 empty text (crc 0); doc 7 passthrough
    val dir = writeDocs(Seq(
      (1L, "hello world of fim splitting", "s0"),
      (2L, "abcdef", "s0"),
      (3L, "", "s0"),
      (4L, "the quick brown fox jumps over the lazy dog", "s0"),
      (7L, "x" * 10, "s0")))
    val got = Curation.fimSplit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq == Seq(
      (1L, false, "none", 28L, 0L, 0L, 2951123111L),
      (2L, true, "psm", 4L, 0L, 2L, 3402654198L),
      (3L, false, "none", 0L, 0L, 0L, 0L),
      (4L, true, "spm", 10L, 19L, 14L, 4088901050L),
      (7L, false, "none", 10L, 0L, 0L, 2396997495L)), s"got ${got.toSeq}")
  }

  test("x50 chat template: pair count, boundaries, serialization and loss mask, pinned") {
    // expected values computed independently (python zlib.crc32 over the
    // serialized bytes and over the '0'/'1' mask string; p = 1 + u1 % 3
    // from the x49 LCG chain): doc 1 p=3; doc 3 p=3 EMPTY text (sentinel
    // skeleton only); doc 5 p=2; doc 9 p=1; doc 12 p=1 short text
    val dir = writeDocs(Seq(
      (1L, "hello world of chat templating today", "s0"),
      (3L, "", "s0"),
      (5L, "x" * 10, "s0"),
      (9L, "the quick brown fox jumps over the lazy dog", "s0"),
      (12L, "abcdef", "s0")))
    val got = Curation.chatTemplate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
    assert(got.toSeq == Seq(
      (1L, 3L, 18L, 18L, 158L, 39L, 246835L, 2995423596L, 1156397665L),
      (3L, 3L, 0L, 0L, 122L, 21L, 172131L, 2751498652L, 555609413L),
      (5L, 2L, 4L, 6L, 104L, 20L, 192307L, 786009736L, 2775805919L),
      (9L, 1L, 21L, 22L, 109L, 29L, 266055L, 1698927214L, 2829304199L),
      (12L, 1L, 3L, 3L, 72L, 10L, 138888L, 4184252212L, 640026679L)),
      s"got ${got.toSeq}")
  }

  test("x51 preference pairs: LCG cut, same-source partner wrap, both CRCs pinned") {
    // expected values computed independently (python zlib.crc32 over both
    // serialized responses): s0 chains 1→2→5→9→wrap→1 (doc 9 EMPTY text:
    // zero-length prompt AND chosen, still a partner for doc 5 and a
    // wrapping partner back to doc 1); s1 is a single-doc source, so
    // doc 7 partners with ITSELF and chosen_crc == rejected_crc
    val dir = writeDocs(Seq(
      (1L, "alpha continuation of document one", "s0"),
      (2L, "bravo continuation of document two", "s0"),
      (5L, "charlie continuation of document five", "s0"),
      (7L, "delta single doc in its own source", "s1"),
      (9L, "", "s0")))
    val got = Curation.preferencePairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq == Seq(
      (1L, 2L, 18L, 16L, 2L, 991690473L, 672838019L),
      (2L, 5L, 32L, 2L, 16L, 4028850325L, 3478764638L),
      (5L, 9L, 21L, 16L, 0L, 1997352136L, 810076725L),
      (7L, 7L, 6L, 28L, 28L, 3917150860L, 3917150860L),
      (9L, 1L, 0L, 0L, 16L, 704279248L, 4248843372L)), s"got ${got.toSeq}")
  }

  test("x51 shard-bounded partnering equals source-wide when shards cover the source") {
    import org.apache.spark.sql.functions.{col, expr, struct}
    val dir = writeDocs(Seq(
      (1L, "alpha continuation of document one", "s0"),
      (2L, "bravo continuation of document two", "s0"),
      (5L, "charlie continuation of document five", "s0"),
      (7L, "delta single doc in its own source", "s1"),
      (9L, "", "s0")))
    val wide = Curation.preferencePairs(spark, dir)
      .collect().map(_.toSeq).toSeq
    // a shard term coarser than any doc_id here: one shard per source,
    // so the bounded ring IS the source ring — byte-identical audit
    val cover = Curation.preferencePairs(spark, dir,
        partnerKey = struct(col("source"), expr("doc_id div 1000")))
      .collect().map(_.toSeq).toSeq
    assert(cover == wide)
    // width-4 shards actually narrow the rings: s0 splits into
    // {1,2}(shard 0) and {5}(shard 1) and {9}(shard 2) — each ring wraps
    // within its shard, so 2 partners back to 1 and the singletons self-pair
    val sharded = Curation.preferencePairs(spark, dir,
        partnerKey = struct(col("source"), expr("doc_id div 4")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sharded == Map(1L -> 2L, 2L -> 1L, 5L -> 5L, 7L -> 7L, 9L -> 9L),
      s"got $sharded")
  }

  test("p1 classifier stage rejects bulk-source docs that fail the Pareto draw") {
    // all-negative labels: every trained weight moves negative, so
    // prob_micros < 500000 deterministically; u15(7) = 19564 is far above
    // T(500) <= 853, so the draw rejects — the one stage left to fail
    val dir = writeDocs(Seq(
      (7L, "the a fast plain words here today now", "s0")))
    val got = Curation.pipelineDecision(spark, dir, minQuality = 0.0,
        positiveSources = Seq("zz"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getString(2)))
    assert(got.toSeq == Seq((7L, false, "classifier_reject")), s"got ${got.toSeq}")
  }

  test("x42 reason-codes the FIRST failing blocklist rule in production order") {
    val dir = writeDocs(Seq(
      (1L, "clean words only here", "s0"),
      // domain rule fires before the bad word it also contains
      (2L, "dup text on a blocked domain", "src7"),
      (3L, "this doc mentions dup once", "s0"),       // word list
      (4L, "Lorem Ipsum dolor sit amet", "s0"),       // phrase, case-folded
      // "lorem" the TOKEN also fires first on the lowercased split —
      // word rule precedes phrase, so reason is blocked_word
      (5L, "read our privacy policy for details", "s0"), // phrase only
      (6L, "function f() { return 1 } end", "s0"),    // curly brace markup
      (7L, "enable JavaScript to continue", "s0")))   // js rule, case-folded
    val got = Curation.blocklistFilter(spark, dir)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getString(2)))
    assert(got.toSeq == Seq(
      (1L, true, "ok"),
      (2L, false, "blocked_domain"),
      (3L, false, "blocked_word"),
      (4L, false, "blocked_word"),
      (5L, false, "blocked_phrase"),
      (6L, false, "markup"),
      (7L, false, "markup")), s"got ${got.toSeq}")
  }

  test("x42b broadcast-frame gate is row-identical to the literal-set gate") {
    // every rule class + the multi-rule precedence cases, literal vs
    // broadcast: the equivalence the production swap depends on
    val dir = writeDocs(Seq(
      (1L, "clean words only here", "s0"),
      (2L, "dup text on a blocked domain", "src7"),
      (3L, "this doc mentions dup once", "s0"),
      (4L, "Lorem Ipsum dolor sit amet", "s0"),
      (5L, "read our privacy policy for details", "s0"),
      (6L, "function f() { return 1 } end", "s0"),
      (7L, "enable JavaScript to continue", "s0"),
      // word + phrase together: priority picks blocked_word both ways
      (8L, "dup site uses cookies everywhere", "s0"),
      (9L, "", "s0")))
    val lit = Curation.blocklistFilter(spark, dir)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getString(2))).toSeq
    val bc = Curation.blocklistFilterBroadcast(spark, dir)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getString(2))).toSeq
    assert(bc == lit, s"broadcast=$bc literal=$lit")
    assert(lit.count(!_._2) == 7, s"fixture must exercise the gate: $lit")
    // and on the driver's real table, where the corpus-live entries fire
    val real = "/root/testdata/sf0.001"
    val litR = Curation.blocklistFilter(spark, real)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getString(2))).toSeq
    val bcR = Curation.blocklistFilterBroadcast(spark, real)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getString(2))).toSeq
    assert(bcR == litR)
    assert(litR.exists(!_._2), "driver table must have live blocklist hits")
  }

  test("x42c bloom-prefilter gate is row-identical; confirm joins eat forced false positives") {
    import org.apache.spark.sql.functions.col
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getBoolean(1), r.getString(2))).toSeq
    // the x42b fixture: every rule class + the precedence cases
    val dir = writeDocs(Seq(
      (1L, "clean words only here", "s0"),
      (2L, "dup text on a blocked domain", "src7"),
      (3L, "this doc mentions dup once", "s0"),
      (4L, "Lorem Ipsum dolor sit amet", "s0"),
      (5L, "read our privacy policy for details", "s0"),
      (6L, "function f() { return 1 } end", "s0"),
      (7L, "enable JavaScript to continue", "s0"),
      (8L, "dup site uses cookies everywhere", "s0"),
      (9L, "", "s0")))
    val lit = rows(Curation.blocklistFilter(spark, dir))
    assert(rows(Curation.blocklistFilterBloom(spark, dir)) == lit)
    // the shape the Bloom buys: the confirm joins run as SHUFFLE hash
    // joins (the past-broadcast-limit plan), never broadcast
    val plan = Curation.blocklistFilterBloom(spark, dir)
      .queryExecution.executedPlan.toString
    assert("ShuffledHashJoin".r.findAllIn(plan).size >= 2, plan)
    // and on the driver's real table, where the corpus-live entries fire
    val real = "/root/testdata/sf0.001"
    assert(rows(Curation.blocklistFilterBloom(spark, real)) ==
      rows(Curation.blocklistFilter(spark, real)))
    // FORCED-false-positive regime: at m=64/k=1 a non-listed token that
    // Bloom-maybes is easy to mine; plant it in a clean doc and the
    // exact confirm join must still reject it — the FP-safety contract
    val (m, k) = (64, 1)
    val bits = Curation.bloomBuild(spark, Curation.blockedWords, m, k)
    import spark.implicits._
    val fp = (0 until 500).map(i => s"fp$i")
      .toDF("tok")
      .filter(Curation.bloomMaybe(bits, m, k)(col("tok")))
      .collect().map(_.getString(0))
      .find(t => !Curation.blockedWords.contains(t))
    assert(fp.nonEmpty, "expected >=1 mined false positive at m=64/k=1")
    val dir2 = writeDocs(Seq(
      (1L, s"clean filler ${fp.get} stays clean", "s0"),
      (2L, "this doc mentions dup once", "s0")))
    val got2 = rows(Curation.blocklistFilterBloom(spark, dir2, m, k))
    assert(got2 == rows(Curation.blocklistFilter(spark, dir2)))
    assert(got2 == Seq((1L, true, "ok"), (2L, false, "blocked_word")), got2)
    // the default-size filter actually FILTERS: none of the clean doc's
    // tokens survive the word bloom (deterministic hash family)
    val dBits = Curation.bloomBuild(spark, Curation.blockedWords, 2048, 5)
    val survivors = "clean words only here".split(" ").toSeq
      .toDF("tok")
      .filter(Curation.bloomMaybe(dBits, 2048, 5)(col("tok")))
      .count()
    assert(survivors == 0L, s"$survivors clean tokens bloom-survived")
    // the native kernel the operator runs is window-for-window equal to
    // the bloomMaybe Column spelling, both modes, on the adversarial
    // strings: multibyte UTF-8, empty string, repeated/trailing spaces
    // (split's limit=-1 empties), the mined FP token, live hits
    import org.apache.spark.sql.functions.{expr => fexpr, filter => ffilter,
      length => flength, lit => flit, lower => flower, sequence => fsequence,
      split => fsplit, transform => ftransform, when => fwhen}
    val probeStrs = Seq("clean words only here", s"x ${fp.get} café 日本語",
      "", " a  b ", "lorem ipsum dolor", "dup")
    for ((bits2, g) <- Seq((bits, 0), (Curation.bloomBuild(spark,
        Curation.blockedPhrases.map(_.substring(0, 4)), m, k), 4))) {
      val ref = if (g == 0)
        ffilter(fsplit(col("s"), " "),
          t => Curation.bloomMaybe(bits2, m, k)(t))
      else fwhen(flength(col("s")) >= g,
          ffilter(ftransform(fsequence(flit(1), flength(col("s")) - flit(g - 1)),
            i => col("s").substr(i, flit(g))),
            t => Curation.bloomMaybe(bits2, m, k)(t)))
        .otherwise(fexpr("array()"))
      val rows2 = probeStrs.toDF("s")
        .select(col("s"), ref.as("want"),
          graft.functions.Sketches.bloomCandidates(col("s"), g, bits2, k)
            .as("got"))
        .collect()
      rows2.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"mode=$g s='${r.getString(0)}': " +
            s"column=${r.getSeq[String](1)} kernel=${r.getSeq[String](2)}")
      }
    }
  }

  test("p3 low-reputation domains override the p2 verdict; healthy domains pass through") {
    // the p2-agreement fixture (each doc a PER-PAGE stage): site1-site4
    // collapse (0 kept of 1 → 0*100 < 1 fires), site5's one doc passes
    // the whole funnel (1*100 >= 1 → healthy, verdict rides through)
    val dir = writeDocs(Seq(
      (1L, "the a fast w1 w2 w3 w4 w5 the a fast w6", "s0"),   // robots
      (30L, "tiny", "s0"),                                     // no_content
      (24L, "the a fast w1 w2 w3 w4 w5 the a fast w6", "src7"), // blocked_domain
      (25L, "this doc mentions dup once it does", "s0"),       // blocked_word
      (26L, "the a fast v1 v2 v3 v4 v5 the a fast v6", "s0"))) // ok throughout
    val got = Curation.reputationGate(spark, dir, minQuality = 0.0,
        positiveSources = Seq("s0"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2),
        r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, "site1.example.com", false, "low_reputation"),
      (24L, "site3.example.com", false, "low_reputation"),
      (25L, "site4.example.com", false, "low_reputation"),
      (26L, "site5.example.com", true, "ok"),
      (30L, "site2.example.com", false, "low_reputation")), s"got ${got.toSeq}")
  }

  test("p3 reputation rule is the strict integer cross-multiply, not a rounded rate") {
    // site5 gets TWO docs (26 ok, 33 no_content): 1 kept of 2 →
    // 1*100 >= 2, the domain stays healthy and doc 33 KEEPS its own
    // p2 reason — the pass-through direction a rounded-double compare
    // could get wrong at scale boundaries
    val dir = writeDocs(Seq(
      (26L, "the a fast v1 v2 v3 v4 v5 the a fast v6", "s0"),
      (33L, "tiny2", "s0"),
      (30L, "tiny", "s0")))
    val got = Curation.reputationGate(spark, dir, minQuality = 0.0,
        positiveSources = Seq("s0"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2),
        r.getString(3)))
    assert(got.toSeq == Seq(
      (26L, "site5.example.com", true, "ok"),
      (30L, "site2.example.com", false, "low_reputation"),
      (33L, "site5.example.com", false, "no_content")), s"got ${got.toSeq}")
  }

  private def writeLangDocs(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = tempSfDir()
    rows.map { case (id, text, lang) => (id, text, lang, "s0", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    dir
  }

  test("cls6 separates languages with disjoint vocabularies") {
    // the cls1 separation convention: on a fixture where each language
    // owns a disjoint token set, the trained one-vs-rest model must
    // classify EVERY document correctly — this is the property that
    // distinguishes a trained classifier from the priority-argmax
    // fallback it degenerates to on signal-free labels
    val dir = writeLangDocs(Seq(
      (0L, "alpha beta alpha gamma beta alpha", "en"),
      (1L, "delta epsilon delta zeta epsilon", "fr"),
      (2L, "eta theta eta iota theta eta", "zh"),
      (3L, "alpha gamma gamma beta alpha beta", "en"),
      (4L, "epsilon zeta zeta delta epsilon", "fr"),
      (5L, "iota eta theta iota eta theta", "zh"),
      (6L, "beta alpha beta gamma alpha", "en"),
      (7L, "zeta delta epsilon zeta delta", "fr")))
    val got = Curation.langClassifier(spark, dir)
      .select("doc_id", "lang", "pred_lang", "correct").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getBoolean(3)))
    assert(got.forall(_._4),
      s"every disjoint-vocabulary doc must classify correctly: ${got.toSeq}")
    assert(got.map(_._2).toSet == Set("en", "fr", "zh"))
  }

  test("p4: the cls6 lang gate flips exactly the heuristic's lang_mismatch verdicts") {
    // disjoint per-language vocabularies, NONE of them x1 marker words:
    // the heuristic sees zero marker hits everywhere and votes 'en' by
    // priority, so p2 calls every fr/zh doc lang_mismatch — while cls6
    // learns the separation and p4 passes them. Reason-for-reason: the
    // two pipelines may differ ONLY where the two pred_langs differ.
    // ids start at 8 so the analytic robots rule allows every doc (the
    // path/dis prefix collision lives in ids 0-7 and 15).
    val docs = Seq(
      (8L, "alpha beta alpha gamma beta alpha gamma beta", "en"),
      (9L, "delta epsilon delta zeta epsilon delta zeta", "fr"),
      (10L, "eta theta eta iota theta eta iota theta eta", "zh"),
      (11L, "alpha gamma gamma beta alpha beta alpha", "en"),
      (12L, "epsilon zeta zeta delta epsilon zeta delta", "fr"),
      (13L, "iota eta theta iota eta theta theta iota", "zh"))
    val dir = writeLangDocs(docs)
    def reasons(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
      df.collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val p2r = reasons(Curation.webPipelineDecision(spark, dir,
      minQuality = 0.0, positiveSources = Seq("s0")))
    val p4r = reasons(Curation.webPipelineClsLang(spark, dir,
      minQuality = 0.0, positiveSources = Seq("s0")))
    val langOf = docs.map { case (id, _, l) => id -> l }.toMap
    docs.foreach { case (id, _, _) =>
      if (langOf(id) == "en") {
        assert(p2r(id) == p4r(id),
          s"doc $id (en): both gates agree with the label -> same reason")
        assert(p2r(id) == "ok", s"doc $id should survive both pipelines")
      } else {
        assert(p2r(id) == "lang_mismatch",
          s"doc $id (${langOf(id)}): the marker heuristic votes en")
        assert(p4r(id) == "ok",
          s"doc $id (${langOf(id)}): cls6 learns the vocabulary split")
      }
    }
  }

  test("cls6 prior collapse on signal-free labels is the priority argmax, deterministically") {
    // every doc shares ONE vocabulary while labels vary: the per-class
    // scores stay close, and the x1 priority chain (en > es > de > fr >
    // zh on ties) decides — the documented behavior on the driver's
    // near-signal-free corpus, pinned so a drift in the tie chain or
    // the integer grids shows up here
    val dir = writeLangDocs(Seq(
      (0L, "common words shared by all docs here", "en"),
      (1L, "common words shared by all docs here", "fr"),
      (2L, "common words shared by all docs here", "zh"),
      (3L, "common words shared by all docs here", "de")))
    val got = Curation.langClassifier(spark, dir)
      .select("doc_id", "pred_lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // identical texts → identical score vectors → ONE predicted class
    // for all docs, chosen by the priority chain
    assert(got.map(_._2).distinct.length == 1, s"got ${got.toSeq}")
  }

  private def writeEmbeddings(rows: Seq[(Long, Seq[Float], Int)]): String = {
    import spark.implicits._
    val dir = tempSfDir()
    rows.toDF("vec_id", "embedding", "label")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("k1 assigns each vector to its nearest centroid; ties go to the smallest id") {
    val dir = writeEmbeddings(Seq(
      (0L, Seq(1f, 0f), 0), // centroid 0
      (1L, Seq(0f, 1f), 0), // centroid 1
      (2L, Seq(0.9f, 0.1f), 0), // nearer centroid 0
      (3L, Seq(0.1f, 0.9f), 0), // nearer centroid 1
      (4L, Seq(1f, 1f), 0))) // equidistant -> tie -> centroid 0
    val got = Curation.centroidAssign(spark, dir, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    // centroid 0: vectors 0, 2, 4; centroid 1: vectors 1, 3
    assert(got.toSeq == Seq((0L, 3L, 0L), (1L, 2L, 1L)))
  }

  test("k2 finds near-dups within a cluster and misses them across clusters by design") {
    val dir = writeEmbeddings(Seq(
      (0L, Seq(1f, 0f), 0),        // centroid 0
      (1L, Seq(0f, 1f), 0),        // centroid 1
      (2L, Seq(0.9f, 0.1f), 0),    // cluster 0
      (3L, Seq(0.95f, 0.05f), 0),  // cluster 0
      (4L, Seq(0.7f, 0.72f), 0),   // cluster 1 (barely)
      (5L, Seq(0.72f, 0.7f), 0)))  // cluster 0 (barely); cos(4,5) ~ 0.999
    val got = Curation.semDedupPairs(spark, dir, k = 2, minCosine = 0.99)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    // within cluster 0: (0,2), (0,3), (2,3) clear 0.99; the true near-dup
    // (4,5) straddles the cluster boundary and is NOT reported — the
    // documented recall trade of SemDedup blocking
    assert(got == Set((0L, 2L), (0L, 3L), (2L, 3L)), s"got $got")
  }

  test("k3 Lloyd refinement recovers both clusters from seeds inside one") {
    // both seeds (vec 0, 1) start inside the first tight group; the mean
    // update must pull one centroid over to the second group
    val dir = writeEmbeddings(Seq(
      (0L, Seq(1f, 0f), 0), (1L, Seq(0.99f, 0.01f), 0), (2L, Seq(0.98f, 0.02f), 0),
      (3L, Seq(0f, 1f), 1), (4L, Seq(0.01f, 0.99f), 1), (5L, Seq(0.02f, 0.98f), 1)))
    val got = Curation.kmeansRefine(spark, dir, k = 2, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.map(t => (t._1, t._2, t._4)).toSeq == Seq((0L, 3L, 0L), (1L, 3L, 3L)),
      s"got ${got.toSeq}")
    assert(got.forall(_._3 > 0.999), s"tight clusters must score high, got ${got.toSeq}")
  }

  test("k1 centroids assign to themselves with cosine 1") {
    val dir = writeEmbeddings(
      (0L to 3L).map(i => (i, Seq.tabulate(4)(j => if (j == i) 1f else 0f), 0)))
    val got = Curation.centroidAssign(spark, dir, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == (0L to 3L).map(i => (i, 1L, 1.0)).toSeq)
  }

  private def words(n: Int): String = Seq.fill(n)("w").mkString(" ")

  test("x20 bins fill greedily in doc_id order and sources pack independently") {
    val dir = writeDocs(Seq(
      (1L, words(4), "s0"), (2L, words(5), "s0"), (3L, words(3), "s0"),
      (4L, words(12), "s0"), (5L, words(2), "s0"),
      (6L, words(7), "s1")))
    val got = Curation.packSequences(spark, dir, binTokens = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // s0: docs 1-3 start under token 10 -> bin 0 (12 tokens: the crossing
    // doc spills); doc 4 starts at 12 -> bin 1; doc 5 at 24 -> bin 2
    assert(got.toSeq == Seq(
      ("s0", 0L, 3L, 12L), ("s0", 1L, 1L, 12L), ("s0", 2L, 1L, 2L),
      ("s1", 0L, 1L, 7L)))
  }

  test("x27 split packing fills every bin exactly except the last per source") {
    val dir = writeDocs(Seq(
      (1L, words(4), "s0"), (2L, words(5), "s0"), (3L, words(3), "s0"),
      (4L, words(12), "s0"), (5L, words(2), "s0"), // 26 tokens total
      (6L, words(7), "s1")))
    val got = Curation.packSegments(spark, dir, binTokens = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // s0 layout: d1[0,4) d2[4,9) d3[9,12) d4[12,24) d5[24,26)
    // bin0: d1(4) d2(5) d3(1 of 3)          = 10
    // bin1: d3(2) d4(8 of 12)               = 10
    // bin2: d4(4) d5(2)                     = 6 (last bin, short)
    assert(got.toSeq == Seq(
      ("s0", 0L, 3L, 10L), ("s0", 1L, 2L, 10L), ("s0", 2L, 2L, 6L),
      ("s1", 0L, 1L, 7L)), s"got ${got.toSeq}")
  }

  test("x21 weights rank target-like docs above off-target docs") {
    import spark.implicits._
    val dir = tempSfDir()
    Seq((1L, "x x", "en", "s0", 3L), (2L, "y y", "fr", "s0", 3L),
        (3L, "x y", "fr", "s0", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    val got = Curation.dsirWeights(spark, dir, targetLang = "en")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // x: cc=3 tc=2; y: cc=3 tc=0; ctot=6 ttot=2 v=2
    // lr(x) = ln(3/4) - ln(4/8) = ln 1.5; lr(y) = ln(1/4) - ln(4/8) = ln 0.5
    assert(got.toSeq == Seq(
      (1L, 2L, 0.4055), (2L, 2L, -0.6931), (3L, 2L, -0.1438)))
  }

  test("x22 chunk grid covers every token and only the last chunk is short") {
    val dir = writeDocs(Seq(
      (1L, words(10), "s0"), // exact multiple of stride past the window
      (2L, words(11), "s0"), // short tail chunk
      (3L, words(2), "s0"))) // shorter than one window
    val got = Curation.docChunks(spark, dir, window = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 0L, 0L, 4L), (1L, 1L, 3L, 4L), (1L, 2L, 6L, 4L),
      (2L, 0L, 0L, 4L), (2L, 1L, 3L, 4L), (2L, 2L, 6L, 4L), (2L, 3L, 9L, 2L),
      (3L, 0L, 0L, 2L)))
    // coverage: the last chunk of every doc ends exactly at the doc's end
    val wc = Map(1L -> 10L, 2L -> 11L, 3L -> 2L)
    got.groupBy(_._1).foreach { case (doc, chunks) =>
      val (_, _, start, len) = chunks.maxBy(_._2)
      assert(start + len == wc(doc), s"doc $doc last chunk must end at ${wc(doc)}")
    }
  }

  test("x36 split is exactly stratified per source, reproducible, and key-ordered") {
    // source A: 100 docs -> EXACTLY 98/1/1 at the default percentages;
    // source B: 3 docs -> integer boundaries give 2 train / 0 val / 1 test
    // (2*100 <= 3*98 but 3*100 > 3*99)
    val dir = writeDocs(
      (1L to 100L).map(i => (i, s"doc $i", "A")) ++
        Seq((201L, "b1", "B"), (202L, "b2", "B"), (203L, "b3", "B")))
    val got = Curation.splitAssign(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    val bySrc = got.groupBy(_._2)
    def counts(src: String) = bySrc(src).groupBy(_._5).view.mapValues(_.size).toMap
    assert(counts("A") == Map("train" -> 98, "val" -> 1, "test" -> 1),
      s"A: ${counts("A")}")
    assert(counts("B") == Map("train" -> 2, "test" -> 1), s"B: ${counts("B")}")
    // ranks are a permutation of 1..n per source, ordered by (key, id),
    // and the split follows the rank order: all train ranks < the val
    // rank < the test rank
    bySrc.foreach { case (src, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._1))
      assert(sorted.map(_._4).toSeq == (1L to rows.size).toSeq,
        s"$src ranks not a permutation in key order")
      val maxTrain = rows.filter(_._5 == "train").map(_._4).max
      val minTest = rows.filter(_._5 == "test").map(_._4).min
      assert(maxTrain < minTest, s"$src: split must follow rank order")
    }
    // byte-reproducible: a second run lands identically
    val again = Curation.splitAssign(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(again.toSeq == got.toSeq, "split must reproduce run-to-run")
  }

  test("x36 assigns null-source docs instead of dropping them through the offset join") {
    import spark.implicits._
    val dir = tempSfDir()
    Seq((1L, "a", "en", "s0", 1L), (2L, "b", "en", "s0", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .unionByName(Seq((9L, "orphan", "en", 1L)).toDF("doc_id", "text", "lang", "n_chars")
        .withColumn("source", org.apache.spark.sql.functions.lit(null).cast("string"))
        .select("doc_id", "text", "lang", "source", "n_chars"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    val got = Curation.splitAssign(spark, dir).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getString(4)))
    assert(got.length == 3, s"every doc gets a split, got ${got.toSeq}")
    // the null source forms its own stratum: its single doc ranks 1 of 1
    // -> train (1*100 <= 1*98 is false... 100 > 98 -> falls through 99
    // too -> test); what matters is it IS assigned, deterministically
    val orphan = got.find(_._1 == 9L).get
    assert(orphan._2.isEmpty && orphan._3 == "test", s"orphan: $orphan")
  }

  // cls1 fixture: disjoint vocabularies -> linearly separable in the
  // hashed feature space; token order rotates per doc so texts differ
  private def cls1Fixture(nPerClass: Int): Seq[(Long, String, String)] = {
    val posVocab = Seq("aurora", "borealis", "cascade", "dynamo",
      "ember", "fjord", "glacier", "horizon")
    val negVocab = Seq("sludge", "clickbait", "spamword", "lorem",
      "garble", "mangle", "noise", "fuzz")
    def doc(id: Long, vocab: Seq[String]) = {
      val rot = (id % vocab.size).toInt
      (vocab.drop(rot) ++ vocab.take(rot)).mkString(" ")
    }
    (0 until nPerClass).map(i => (i.toLong, doc(i, posVocab), "hi")) ++
      (0 until nPerClass).map(i =>
        (nPerClass + i.toLong, doc(i, negVocab), "lo"))
  }

  test("cls1 separates disjoint-vocabulary classes and reproduces run-to-run") {
    val dir = writeDocs(cls1Fixture(20))
    def run() = Curation
      .qualityClassifier(spark, dir, positiveSources = Seq("hi"))
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(2), r.getLong(3), r.getBoolean(5)))
    val got = run()
    assert(got.length == 40)
    got.foreach { case (id, label, margin, pred) =>
      assert(pred == label, s"doc $id: pred $pred != label $label")
      assert(if (label) margin > 0 else margin < 0,
        s"doc $id: margin $margin inconsistent with label $label")
    }
    assert(run().toSeq == got.toSeq, "training + scoring must reproduce")
  }

  test("cls1 zero-iteration model scores everyone at the inclusive 0.5 boundary") {
    val dir = writeDocs(cls1Fixture(3))
    val got = Curation
      .qualityClassifier(spark, dir, iters = 0, positiveSources = Seq("hi"))
      .collect()
      .map(r => (r.getLong(3), r.getLong(4), r.getBoolean(5)))
    // w = 0 -> margin 0, hard-sigmoid 0.5 exactly; pred_high is >= (the
    // documented inclusive convention), so every doc predicts high
    got.foreach { case (margin, prob, pred) =>
      assert(margin == 0L && prob == 500000L && pred,
        s"boundary row: ($margin, $prob, $pred)")
    }
  }

  test("cls1 training reads only the trainSample id prefix") {
    val base = cls1Fixture(10) // ids 0..19
    // a poisoned doc past the sample bound: positive label, negative vocab
    val poisoned = base :+ (100L,
      "sludge clickbait spamword lorem garble mangle noise fuzz", "hi")
    val dirClean = writeDocs(base)
    val dirPoisoned = writeDocs(poisoned)
    def scores(dir: String) = Curation
      .qualityClassifier(spark, dir, trainSample = 50,
        positiveSources = Seq("hi"))
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    val clean = scores(dirClean)
    val withPoison = scores(dirPoisoned)
    // the out-of-sample doc is scored...
    assert(withPoison.contains(100L))
    // ...but never trained on: every shared doc's margin is unchanged
    clean.foreach { case (id, margin) =>
      assert(withPoison(id) == margin,
        s"doc $id margin moved ($margin -> ${withPoison(id)}): " +
          "a doc past trainSample influenced the weights")
    }
  }

  test("cls2 LUT is the strict Pareto inequality at every boundary uniform") {
    val lut = Curation.paretoLut
    assert(lut.length == 1001)
    // endpoints: a perfect score always survives; a zero score keeps the
    // 2^-9 floor
    assert(lut(1000) == 32768L, s"T(1000) = ${lut(1000)}")
    assert(lut(0) == 64L, s"T(0) = ${lut(0)}")
    val num = BigInt(32768) * BigInt(1000).pow(9)
    (0 to 1000).foreach { s3 =>
      val den = BigInt(2000 - s3).pow(9)
      val t = lut(s3)
      // at u = T-1 and u = T (the only places truncation could bite),
      // `u < T` must agree with the exact rational rule u*D < N
      Seq(t - 1, t).filter(u => u >= 0 && u < 32768).foreach { u =>
        val exact = BigInt(u) * den < num
        assert((u < t) == exact,
          s"s3=$s3 T=$t u=$u: LUT ${u < t} != exact $exact")
      }
      // monotone: a better score never lowers the acceptance threshold
      if (s3 > 0) assert(lut(s3) >= lut(s3 - 1), s"LUT not monotone at $s3")
    }
  }

  test("cls2 verdicts equal the driver-recomputed rule and reproduce") {
    val dir = writeDocs(cls1Fixture(20))
    def run() = Curation
      .paretoFilter(spark, dir, positiveSources = Seq("hi"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getBoolean(5)))
    val got = run()
    assert(got.length == 40)
    got.foreach { case (id, prob, u15, tKeep, keep) =>
      val expU = ((id % 2147483648L) * 1103515245L + 12345L) %
        2147483648L / 65536L % 32768L
      assert(u15 == expU, s"doc $id: u15 $u15 != LCG $expU")
      assert(tKeep == Curation.paretoLut((prob / 1000L).toInt),
        s"doc $id: t_keep $tKeep != LUT(${prob / 1000})")
      assert(keep == (u15 < tKeep), s"doc $id: keep $keep != $u15 < $tKeep")
      assert(prob >= 0L && prob <= 1000000L, s"doc $id: prob $prob off-grid")
    }
    assert(run().toSeq == got.toSeq, "cls2 must reproduce run-to-run")
  }

  test("cls2 zero-iteration model applies the exact s3=500 threshold") {
    val dir = writeDocs(cls1Fixture(5))
    val got = Curation
      .paretoFilter(spark, dir, iters = 0, positiveSources = Seq("hi"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getBoolean(5)))
    // w = 0 -> prob exactly 500000 -> s3 = 500 ->
    // T = ceil(32768 * (2/3)^9) = ceil(16777216/19683) = 853
    assert(Curation.paretoLut(500) == 853L)
    got.foreach { case (id, prob, u15, keep) =>
      assert(prob == 500000L, s"doc $id: prob $prob")
      assert(keep == (u15 < 853L), s"doc $id: keep $keep at u15 $u15")
    }
  }

  test("x37 keeps every near-dup group inside one split") {
    // within-source near-dup groups {0,1,2}, {3,4}, {6,7}; singletons 5, 8;
    // identical texts across sources (0 vs 6) never pair — d4 candidates
    // are within-source by construction
    val dir = writeDocs(Seq(
      (0L, "alpha beta gamma delta", "s0"),
      (1L, "alpha beta gamma delta", "s0"),
      (2L, "alpha beta gamma delta", "s0"),
      (3L, "epsilon zeta eta theta", "s0"),
      (4L, "epsilon zeta eta theta", "s0"),
      (5L, "iota kappa lambda mu", "s0"),
      (6L, "alpha beta gamma delta", "s1"),
      (7L, "alpha beta gamma delta", "s1"),
      (8L, "nu xi omicron pi", "s1")))
    def run() = Curation.leakageSplit(spark, dir, trainPct = 34, valPct = 33)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    val got = run()
    assert(got.length == 9, "every doc is assigned")
    val byDoc = got.map(r => r._1 -> r._4).toMap
    // the leakage guarantee: a group is atomic across splits
    Seq(Seq(0L, 1L, 2L), Seq(3L, 4L), Seq(6L, 7L)).foreach { g =>
      assert(g.map(byDoc).distinct.size == 1, s"group $g straddles splits")
    }
    // group ids are the min member; reps stratify exactly: s0 has 3 reps
    // at 34/33 -> one of each split
    got.foreach { case (id, _, gid, _) =>
      val exp = Seq(Seq(0L, 1L, 2L), Seq(3L, 4L), Seq(6L, 7L))
        .find(_.contains(id)).map(_.min).getOrElse(id)
      assert(gid == exp, s"doc $id group $gid != $exp")
    }
    val s0Splits = Seq(0L, 3L, 5L).map(byDoc).sorted
    assert(s0Splits == Seq("test", "train", "val"),
      s"s0 reps must stratify one per split, got $s0Splits")
    assert(run().toSeq == got.toSeq, "x37 must reproduce run-to-run")
  }

  test("x37 degenerates to exactly x36 on a dup-free corpus") {
    val dir = writeDocs((0 until 10).map { i =>
      (i.toLong, s"w${i}a w${i}b w${i}c", if (i % 2 == 0) "s0" else "s1")
    })
    val x37 = Curation.leakageSplit(spark, dir, trainPct = 50, valPct = 25)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    val x36 = Curation.splitAssign(spark, dir, trainPct = 50, valPct = 25)
      .collect().map(r => (r.getLong(0), r.getString(4))).toMap
    x37.foreach { case (id, gid, split) =>
      assert(gid == id, s"doc $id not a singleton group ($gid)")
      assert(split == x36(id), s"doc $id: x37 $split != x36 ${x36(id)}")
    }
  }

  test("cls3 reliability arithmetic is exact on a crafted scored frame") {
    import spark.implicits._
    // bin 0: one negative at p=0.05; bin 1: a truncating-average pair
    // (149999 + 100000) with one positive; bin 10: a perfect positive
    val scored = Seq(
      (50000L, false), (149999L, false), (100000L, true), (1000000L, true))
      .toDF("prob_micros", "label_high")
    val got = Curation.calibrationOf(scored).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq == Seq(
      // (bin, n, n_pos, sum, avg = sum div n, rate = pos*1e6 div n, gap)
      (0L, 1L, 0L, 50000L, 50000L, 0L, 50000L),
      (1L, 2L, 1L, 249999L, 124999L, 500000L, -375001L),
      (10L, 1L, 1L, 1000000L, 1000000L, 1000000L, 0L)),
      s"got ${got.toSeq}")
  }

  test("cls3 bins are label-pure on the separable fixture") {
    val dir = writeDocs(cls1Fixture(20))
    val got = Curation.calibrationTable(spark, dir, positiveSources = Seq("hi"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5)))
    assert(got.map(_._2).sum == 40L, "every doc lands in exactly one bin")
    assert(got.map(_._3).sum == 20L, "positive mass preserved")
    assert(got.map(_._1).toSeq == got.map(_._1).toSeq.sorted, "bins ordered")
    // cls1 predicts pred == label on this fixture (prob >= 500000 iff
    // positive), so bins below 5 hold only negatives, 5+ only positives —
    // and each pure bin's empirical rate is exactly 0 or 1e6
    got.foreach { case (bin, n, pos, rate) =>
      if (bin < 5) assert(pos == 0L && rate == 0L, s"bin $bin impure: $pos")
      else assert(pos == n && rate == 1000000L, s"bin $bin impure: $pos/$n")
    }
  }

  test("cls4 sweep arithmetic is exact incl. the NULL-precision tail") {
    import spark.implicits._
    // one pos at 0.4, one neg at 0.1: thresholds 0-1 predict both
    // positive, 2-4 predict only the positive, 5-10 predict NOTHING —
    // the undefined-precision case both engines must agree is NULL
    val scored = Seq((400000L, true), (100000L, false))
      .toDF("prob_micros", "label_high")
    val got = Curation.thresholdSweepOf(scored).collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5),
        if (r.isNullAt(6)) -1L else r.getLong(6),
        if (r.isNullAt(7)) -1L else r.getLong(7))
    }
    assert(got.length == 11, "one row per decile threshold")
    got.foreach { case (t, tp, fp, fn, tn, p, rcl, f1) =>
      val exp =
        if (t <= 100000L) (1L, 1L, 0L, 0L, 500000L, 1000000L, 666666L)
        else if (t <= 400000L) (1L, 0L, 0L, 1L, 1000000L, 1000000L, 1000000L)
        else (0L, 0L, 1L, 1L, -1L, 0L, -1L) // NULL precision/F1
      assert((tp, fp, fn, tn, p, rcl, f1) == exp, s"threshold $t: got ${(tp, fp, fn, tn, p, rcl, f1)}")
    }
  }

  test("cls5 AUC is the exact tie-aware rank statistic") {
    import spark.implicits._
    // tie across classes at 0.1 (half credit), one neg between the
    // positives — support straddles decile buckets 1/2/3, exercising
    // the broadcast offset join: 2U = 1*(0+1) + 1*(4+0) = 5, AUC = 5/8
    val scored = Seq(
      (100000L, false), (100000L, true), (250000L, false), (300000L, true))
      .toDF("prob_micros", "label_high")
    val got = Curation.aucOf(scored).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)) ==
      ((2L, 2L, 5L, 0.625)), s"got ${r.toSeq}")
    // degenerate one-class frame: AUC undefined -> NULL, numerator 0
    val onlyPos = Seq((100000L, true), (900000L, true))
      .toDF("prob_micros", "label_high")
    val d = Curation.aucOf(onlyPos).collect().head
    assert((d.getLong(0), d.getLong(1), d.getLong(2), d.isNullAt(3)) ==
      ((2L, 0L, 0L, true)), s"got ${d.toSeq}")
  }

  test("cls4/cls5 read the separable fixture as a perfect classifier") {
    val dir = writeDocs(cls1Fixture(20))
    // cls1 predicts pred == label on this fixture (CurationSpec's cls1/
    // cls3 pins), so the 0.5 operating point is a perfect confusion
    // matrix and the ranking is perfectly separated
    val sweep = Curation.thresholdSweep(spark, dir, positiveSources = Seq("hi"))
      .collect().map(r => r.getLong(0) -> r)
      .toMap
    val mid = sweep(500000L)
    assert((mid.getLong(1), mid.getLong(2), mid.getLong(3), mid.getLong(4),
      mid.getLong(5), mid.getLong(6), mid.getLong(7)) ==
      ((20L, 0L, 0L, 20L, 1000000L, 1000000L, 1000000L)),
      s"mid threshold: ${mid.toSeq}")
    val auc = Curation.aucTable(spark, dir, positiveSources = Seq("hi"))
      .collect().head
    assert((auc.getLong(0), auc.getLong(1), auc.getLong(2),
      auc.getDouble(3)) == ((20L, 20L, 800L, 1.0)), s"auc: ${auc.toSeq}")
  }

  test("cls driver-local gradient round equals the Spark-side aggregate round") {
    // ClassifierLocal replaced the per-round Spark aggregate+join+collect
    // (round-17 optimization). Pin the replacement bit-for-bit on real
    // corpus features: two consecutive rounds computed by the removed
    // Spark form and by ClassifierLocal must produce identical weight
    // vectors (exact longs, so equality is exact).
    import org.apache.spark.sql.functions._
    import graft.operators.ClassifierLocal
    import graft.functions.Sketches
    val dir = "/root/testdata/sf0.001"
    val dim = 64; val trainSample = 4096; val lrDiv = 2
    val positive = Seq("src0", "src1", "src2", "src3", "src4")
    val emb = Sketches.hashEmbedding(split(col("text"), " "), dim)
    val xqArr = concat(
      transform(emb, v => floor(v * 1e6 + 0.5).cast("long")),
      array(lit(1000000L)))
    val trainDocs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < trainSample)
    val n = trainDocs.count()
    val train = trainDocs
      .select(col("doc_id"),
        when(col("source").isin(positive: _*), 1000000L).otherwise(0L)
          .as("y6"),
        posexplode(xqArr))
      .select(col("doc_id"), col("y6"), col("pos").as("j"),
        col("col").as("xq"))
      .filter(col("xq") =!= 0L)
    val rows = train.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))

    // the removed cluster-side round, verbatim
    val p6Expr =
      "(least(greatest(z12 + 2000000000000, 0), 4000000000000) + 2000000) div 4000000"
    def sparkRound(wq: Array[Long]): Array[Long] = {
      val out = wq.clone()
      val err = train
        .groupBy(col("doc_id"), col("y6"))
        .agg(sum(col("xq") * element_at(typedLit(wq.toSeq), col("j") + 1))
          .as("z12"))
        .selectExpr("doc_id", s"$p6Expr - y6 AS err6")
      train.join(broadcast(err), "doc_id")
        .groupBy(col("j"))
        .agg(sum(col("err6") * col("xq")).as("g"))
        .collect()
        .foreach { r =>
          out(r.getInt(0)) -= r.getLong(1) / (lrDiv.toLong * n * 1000000L)
        }
      out
    }

    val spark1 = sparkRound(Array.fill(dim + 1)(0L))
    val local1 = Array.fill(dim + 1)(0L)
    ClassifierLocal.gradientRound(rows, local1, lrDiv.toLong * n * 1000000L)
    assert(local1.toSeq == spark1.toSeq, "round 1 weights diverge")
    val spark2 = sparkRound(local1)
    val local2 = local1.clone()
    ClassifierLocal.gradientRound(rows, local2, lrDiv.toLong * n * 1000000L)
    assert(local2.toSeq == spark2.toSeq, "round 2 weights diverge")
    assert(local1.exists(_ != 0L), "round 1 did not move the weights")
  }
}
