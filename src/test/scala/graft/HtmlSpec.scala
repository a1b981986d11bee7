package graft

import java.util.zip.CRC32

import org.apache.spark.sql.SaveMode

import graft.operators.Html
import graft.operators.Html.{HtmlBlock, TagWalkBlocker}

/** x41 — TagWalkBlocker block segmentation + classification rules on
  * crafted markup the synthesized corpus never emits, and the end-to-end
  * extraction audit replicated independently from the synthesis rules.
  */
class HtmlSpec extends SparkSpec {

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = tempSfDir()
    rows.map { case (id, text) => (id, text, "en", "s0", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    dir
  }

  private def crc(s: String): Long = {
    val c = new CRC32(); c.update(s.getBytes("UTF-8")); c.getValue
  }

  test("block segmentation splits at block tags, passes through inline tags") {
    val got = TagWalkBlocker.blocks(
      "<div>alpha <b>beta</b> gamma</div><p>delta</p><span>same block " +
        "until</span> a block tag<h2>next</h2>")
    assert(got == Seq(
      HtmlBlock("alpha beta gamma", 0),
      HtmlBlock("delta", 0),
      // span is inline: text before and after it stays one block until <h2>
      HtmlBlock("same block until a block tag", 0),
      HtmlBlock("next", 0)))
  }

  test("script/style raw text and comments are skipped, case-insensitively") {
    val got = TagWalkBlocker.blocks(
      "<p>keep</p><SCRIPT>var x = '<div>not a block</div>';</SCRIPT>" +
        "<style>p { color: red }</style><!-- <p>ghost</p> --><p>end</p>")
    assert(got == Seq(HtmlBlock("keep", 0), HtmlBlock("end", 0)))
  }

  test("quoted '>' inside attributes does not close the tag") {
    val got = TagWalkBlocker.blocks(
      """<p data-x="a>b">text</p><p title='1>2'>more</p>""")
    assert(got == Seq(HtmlBlock("text", 0), HtmlBlock("more", 0)))
  }

  test("entities decode (named, decimal, hex); malformed ones pass literally") {
    val got = TagWalkBlocker.blocks(
      "<p>&lt;tag&gt; &amp; &quot;q&quot; &apos;a&apos; x&nbsp;y " +
        "&#65;&#x42; &bogus; &amp &#xZZ;</p>")
    assert(got == Seq(HtmlBlock(
      "<tag> & \"q\" 'a' x y AB &bogus; &amp &#xZZ;", 0)))
  }

  test("whitespace runs collapse; leading/trailing whitespace drops") {
    val got = TagWalkBlocker.blocks("<p>\t  one \n\r two\f three  </p>")
    assert(got == Seq(HtmlBlock("one two three", 0)))
  }

  test("anchor spans collapse independently: separator space between links belongs to the block") {
    val got = TagWalkBlocker.blocks(
      """<nav><a href="/x">home</a> <a href="/y">about us</a> tail</nav>""")
    // block text "home about us tail" (18); link mass 4 + 8, NOT the
    // separator spaces between anchors
    assert(got == Seq(HtmlBlock("home about us tail", 12)))
  }

  test("nested anchors count once; stray close and self-closing anchors are safe") {
    val nested = TagWalkBlocker.blocks("<p><a><a>deep</a> link</a> out</p>")
    assert(nested == Seq(HtmlBlock("deep link out", 9)))
    val stray = TagWalkBlocker.blocks("<p></a>no link</p>")
    assert(stray == Seq(HtmlBlock("no link", 0)))
    val selfClosing = TagWalkBlocker.blocks("<p><a/>plain</p>")
    assert(selfClosing == Seq(HtmlBlock("plain", 0)))
  }

  test("a block boundary inside an open anchor splits the span's mass per block") {
    val got = TagWalkBlocker.blocks("<a>one<p>two</p>three</a>")
    assert(got == Seq(
      HtmlBlock("one", 3), HtmlBlock("two", 3), HtmlBlock("three", 5)))
  }

  test("degraded input never throws: unterminated tags, junk '<', EOF inside script") {
    assert(TagWalkBlocker.blocks("<p>left open") == Seq(HtmlBlock("left open", 0)))
    assert(TagWalkBlocker.blocks("<p>tail<div unterminated") ==
      Seq(HtmlBlock("tail", 0)))
    assert(TagWalkBlocker.blocks("<p>i <3 parsers</p>") ==
      Seq(HtmlBlock("i <3 parsers", 0))) // '<' before a digit is text (HTML5 rule)
    assert(TagWalkBlocker.blocks("<script>never closed") == Nil)
    assert(TagWalkBlocker.blocks("") == Nil)
  }

  test("uppercase and numbered tags resolve; br splits blocks") {
    val got = TagWalkBlocker.blocks("<P>one<BR>two</P><H3>three</H3>")
    assert(got == Seq(
      HtmlBlock("one", 0), HtmlBlock("two", 0), HtmlBlock("three", 0)))
  }

  test("x41 end-to-end: audit row replicated independently from the synthesis rules") {
    // 100-char doc: chunks of 80 and 20 -> one content (80 >= 25), the
    // 20-char tail is boilerplate by the length rule; id 10 -> ad block
    // (10 % 5 == 0), 8 id-derived wrapper blocks total (incl. rel box)
    val text = ("the quick brown fox jumps over the lazy dog and keeps " +
      "going until one hundred characters are written").take(100)
    assert(text.length == 100)
    val dir = writeDocs(Seq((10L, text)))
    val row = Html.htmlExtract(spark, dir).collect().head
    val html = Html.buildHtml(10L, text)
    val chunk0 = text.substring(0, 80).trim
    val chunk1 = text.substring(80).trim
    assert(row.getLong(0) == 10L)
    assert(row.getLong(1) == html.length.toLong, "html_len")
    assert(row.getLong(2) == crc(html), "html_crc32")
    // blocks: title, h1, nav, links, 2 chunks, ad, rel, footer = 9
    assert(row.getLong(3) == 9L, "n_blocks")
    assert(row.getLong(4) == 1L, "n_content")
    assert(row.getLong(5) == 8L, "n_boiler")
    assert(row.getLong(6) == chunk0.length.toLong, "main_len")
    assert(row.getLong(7) == crc(chunk0), "main_crc32")
    // boiler: title "Doc 10"(6) + h1 "Site 3"(6) + nav "home about p10"(14)
    // + links(38) + ad(18) + rel "r one r two r three"(19) + footer(24)
    // + short chunk
    assert(row.getLong(8) == (6 + 6 + 14 + 38 + 18 + 19 + 24 + chunk1.length).toLong,
      "boiler_len")
  }

  test("x41 classification boundaries: density 1/3 is kept, above drops; length 25 kept, 24 drops") {
    // direct rule probe through the same predicate htmlExtract applies
    def content(b: HtmlBlock): Boolean =
      b.text.length >= 25 && b.linkChars * 3 <= b.text.length
    assert(content(HtmlBlock("x" * 30, 10)))   // exactly 1/3 density
    assert(!content(HtmlBlock("x" * 29, 10)))  // just over 1/3
    assert(content(HtmlBlock("x" * 25, 0)))
    assert(!content(HtmlBlock("x" * 24, 0)))
  }

  test("SwingBlocker seam swap: identical audit on the synthesized corpus shape") {
    // both wrapper shapes (ad and no-ad), entities, multi-chunk docs —
    // the two independent parsers must agree block-for-block
    val docs = Seq(
      10L -> ("the quick brown fox jumps over the lazy dog and keeps " +
        "going until one hundred characters are written").take(100),
      7L -> "short & <angly> doc",
      21L -> ("alpha beta gamma delta epsilon zeta eta theta iota " * 4).trim)
    docs.foreach { case (id, text) =>
      val html = Html.buildHtml(id, text)
      val a = TagWalkBlocker.blocks(html)
      val b = Html.SwingBlocker.blocks(html)
      assert(a == b, s"doc $id:\n tagwalk=$a\n swing=$b")
    }
    // and the full operator is blocker-agnostic end-to-end
    val dir = writeDocs(docs)
    val viaTagWalk = Html.htmlExtract(spark, dir).collect().map(_.toSeq).toSet
    val viaSwing = Html.htmlExtract(spark, dir, blocker = Html.SwingBlocker)
      .collect().map(_.toSeq).toSet
    assert(viaTagWalk == viaSwing)
  }

  test("SwingBlocker parity breadth: the crafted fixtures the JDK event model agrees on") {
    // every crafted TagWalkBlocker fixture where the JDK parser's event
    // model can express the same semantics — block-for-block equality,
    // so a silent drift in EITHER implementation fails here
    val agreeing = Seq(
      "<div>alpha <b>beta</b> gamma</div><p>delta</p><span>same block " +
        "until</span> a block tag<h2>next</h2>",
      """<p data-x="a>b">text</p><p title='1>2'>more</p>""",
      "<p>\t  one \n\r two\f three  </p>",
      """<nav><a href="/x">home</a> <a href="/y">about us</a> tail</nav>""",
      "<p></a>no link</p>",
      "<p>left open",
      "<p>tail<div unterminated",
      "<script>never closed",
      "",
      "<P>one<BR>two</P><H3>three</H3>")
    agreeing.foreach { html =>
      assert(TagWalkBlocker.blocks(html) == Html.SwingBlocker.blocks(html),
        s"divergence on: $html")
    }
    // the outlinks contract agrees on the full crafted href inventory
    val linkHtml = """<a href="/x">x</a><a href='/y?a=1&amp;b=2'>y</a>""" +
      """<a href=/bare>b</a><a class="z">no href</a><a HREF="/up">u</a>""" +
      """<script>var s = '<a href="/ghost">g</a>';</script>""" +
      """<!-- <a href="/c">c</a> --><a data-x="1>2" href="/after">a</a>""" +
      """<a href="">empty</a></a><a href="/sc"/>"""
    assert(TagWalkBlocker.outlinks(linkHtml) == Html.SwingBlocker.outlinks(linkHtml))
  }

  test("SwingBlocker divergence set: the exact JDK-event-model departures, pinned") {
    // where the JDK parser's event model CANNOT express TagWalkBlocker's
    // HTML5-leaning semantics, the divergence is documented and PINNED —
    // if either side moves, this fails and the seam doc must be revisited.
    def swing(html: String) = Html.SwingBlocker.blocks(html)

    // 1. <style> bodies: the JDK parser delivers script bodies as comment
    //    events but style bodies as TEXT, so SwingBlocker emits the CSS
    //    as a block (TagWalkBlocker skips both raw-text elements)
    assert(swing("<p>keep</p><SCRIPT>var x = '<div>not a block</div>';" +
      "</SCRIPT><style>p { color: red }</style><!-- <p>ghost</p> --><p>end</p>")
      == Seq(HtmlBlock("keep", 0), HtmlBlock("p { color: red }", 0),
        HtmlBlock("end", 0)))

    // 2. entity table: HTML-3.2 DTD — no &apos; (literal passthrough),
    //    &nbsp; -> U+00A0 (NOT collapsible whitespace), bare &amp eats the
    //    following space, malformed &#xZZ; -> NUL + literal tail
    assert(swing("<p>&lt;tag&gt; &amp; &quot;q&quot; &apos;a&apos; " +
      "x&nbsp;y &#65;&#x42; &bogus; &amp &#xZZ;</p>")
      == Seq(HtmlBlock(
        "<tag> & \"q\" &apos;a&apos; x\u00a0y AB &bogus; & \u0000ZZ;", 0)))

    // 3. nested anchors: the DTD implies </a> when a second <a> opens, so
    //    only "deep" (4 chars) counts as link mass, not "deep link" (9)
    assert(swing("<p><a><a>deep</a> link</a> out</p>")
      == Seq(HtmlBlock("deep link out", 4)))

    // 4. self-closing <a/>: XML syntax isn't HTML 3.2 — the parser keeps
    //    the anchor open, so the trailing text lands inside the link span
    assert(swing("<p><a/>plain</p>") == Seq(HtmlBlock("plain", 5)))

    // 5. a block boundary inside an open anchor: the DTD implies </a> at
    //    the <p> close, so the span's mass does not carry across blocks
    assert(swing("<a>one<p>two</p>three</a>")
      == Seq(HtmlBlock("one", 3), HtmlBlock("two", 0), HtmlBlock("three", 0)))

    // 6. '<' before a digit: TagWalkBlocker applies the HTML5 text rule;
    //    the JDK tokenizer swallows the '<'
    assert(swing("<p>i <3 parsers</p>") == Seq(HtmlBlock("i 3 parsers", 0)))
  }

  test("outlinks: quoted/bare hrefs, entity decode, script/comment/closing skips") {
    val html = """<a href="/x">x</a><a href='/y?a=1&amp;b=2'>y</a>""" +
      """<a href=/bare>b</a><a class="z">no href</a><a HREF="/up">u</a>""" +
      """<script>var s = '<a href="/ghost">g</a>';</script>""" +
      """<!-- <a href="/c">c</a> --><a data-x="1>2" href="/after">a</a>""" +
      """<a href="">empty</a></a><a href="/sc"/>"""
    assert(TagWalkBlocker.outlinks(html) ==
      Seq("/x", "/y?a=1&b=2", "/bare", "/up", "/after", "", "/sc"))
  }

  test("outlinks on the synthesized page: full anchor inventory, both parsers agree") {
    val html = Html.buildHtml(10L, ("alpha " * 30).trim)
    val tw = TagWalkBlocker.outlinks(html)
    // id 10: k13=10, ad fires (10%5=0), rel targets r1=17 r2=24 r3=11
    // (odd -> HTTP:80, site 11%7=4, q 11%11=0)
    assert(tw == Seq("/home", "/about", "/p10", "/l0", "/l1", "/l2", "/l3",
      "/buy", "/deal", "/a/b17", "/a/x/../b24/",
      "HTTP://www.Site4.Example.Com:80/a/b11?lang=en&q=0&utm_source=x#f",
      "/terms", "/privacy"))
    assert(Html.SwingBlocker.outlinks(html) == tw, "swing parity")
  }

  test("x45 end-to-end: hrefs resolve against the page's canonical URL") {
    val dir = writeDocs(Seq((10L, "short doc")))
    val rows = Html.outlinkGraph(spark, dir).collect()
    val base = "https://site3.example.com"
    assert(rows.forall(_.getString(1) == s"$base/a/b10?lang=en&q=10"), "src_url")
    val got = rows.map(r => (r.getString(2), r.getString(3))).toSeq
    assert(got == Seq(
      ("/a/b17", s"$base/a/b17"),
      ("/a/x/../b24/", s"$base/a/b24"),
      ("/about", s"$base/about"),
      ("/buy", s"$base/buy"),
      ("/deal", s"$base/deal"),
      ("/home", s"$base/home"),
      ("/l0", s"$base/l0"),
      ("/l1", s"$base/l1"),
      ("/l2", s"$base/l2"),
      ("/l3", s"$base/l3"),
      ("/p10", s"$base/p10"),
      ("/privacy", s"$base/privacy"),
      ("/terms", s"$base/terms"),
      ("HTTP://www.Site4.Example.Com:80/a/b11?lang=en&q=0&utm_source=x#f",
        "http://site4.example.com/a/b11?lang=en&q=0")), s"got $got")
  }

  test("relabeled string-keyed pagerank equals the long-keyed kernel on the same graph") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the same topology keyed by longs (the g2 path) and by strings (the
    // g3 path, which relabels to 128-bit hash keys internally): ranks and
    // degrees must agree vertex-for-vertex, fixed and auto-converged
    val pairsL = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (5L, 6L),
      (4L, 7L), (7L, 8L), (8L, 1L)).toDF("a_id", "b_id")
    val pairsS = pairsL.select(concat(lit("u"), col("a_id")).as("a_id"),
      concat(lit("u"), col("b_id")).as("b_id"))
    def byId(df: org.apache.spark.sql.DataFrame, s: Boolean) =
      df.collect().map { r =>
        val id = if (s) r.getString(0) else "u" + r.getLong(0)
        id -> (r.getLong(1), r.getLong(2))
      }.toMap
    try {
      val fixedL = byId(graft.operators.Dedup.pageRankFromPairs(pairsL, 3), s = false)
      val fixedS = byId(graft.operators.Dedup.pageRankFromPairs(pairsS, 3), s = true)
      assert(fixedL == fixedS, "fixed-3 ranks must match across key forms")
      val (autoL, usedL) = graft.operators.Dedup.pageRankFromPairsAuto(pairsL)
      val (autoS, usedS) = graft.operators.Dedup.pageRankFromPairsAuto(pairsS)
      assert(usedL == usedS, s"superstep counts diverged: $usedL vs $usedS")
      assert(byId(autoL, s = false) == byId(autoS, s = true),
        "auto-converged ranks must match across key forms")
    } finally CacheRegistry.releaseAll()
  }

  test("g3 end-to-end: pagerank over the parsed graph; rel cross-link connects families") {
    // id 10's rel-3 target IS id 11's canonical URL (t=11, q=11%11=0):
    // the two pages' otherwise-disjoint site graphs join through it
    val dir = writeDocs(Seq((10L, "short doc"), (11L, "other doc")))
    val rows = Html.linkPageRank(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val byUrl = rows.map(t => t._1 -> t).toMap
    assert(rows.length == 27, s"node count: ${rows.length}")
    val src10 = "https://site3.example.com/a/b10?lang=en&q=10"
    val src11 = "http://site4.example.com/a/b11?lang=en&q=0"
    assert(byUrl(src10)._2 == 14L, "deg(src10): 14 distinct outlinks")
    assert(byUrl(src11)._2 == 13L, "deg(src11): 12 outlinks + the rel inlink")
    assert(byUrl("https://site3.example.com/home")._2 == 1L, "hub deg")
    assert(rows.forall(_._3 > 0L), "all ranks positive")
  }

  test("fuzz: mutated synthesized pages degrade deterministically, never throw") {
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    val base = Html.buildHtml(42L, text)
    val rnd = new scala.util.Random(4242)
    (1 to 2000).foreach { _ =>
      val chars = base.toCharArray
      val nMut = 1 + rnd.nextInt(8)
      (1 to nMut).foreach { _ =>
        chars(rnd.nextInt(chars.length)) =
          "<>&;/\"'ax \u0000".charAt(rnd.nextInt(11))
      }
      val mutated = new String(chars)
      val a = TagWalkBlocker.blocks(mutated)
      val b = TagWalkBlocker.blocks(mutated)
      assert(a == b) // deterministic
      a.foreach(bl => assert(bl.text.nonEmpty && bl.linkChars >= 0))
    }
  }
}
