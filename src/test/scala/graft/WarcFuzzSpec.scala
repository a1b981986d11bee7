package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Warc

/** Randomized robustness harness for the WARC record reader — the
  * MultimodalFuzzSpec discipline applied to the framing seam. The
  * multimodal parsers may fall back silently (raw metadata is honest
  * absence there); the WARC reader's contract is STRICTER: for any
  * input, either the parse is EXACT (records tile the container
  * contiguously, every payload matches its Content-Length) or the
  * reader fails LOUDLY with an intentional error — never a silent
  * resync over corruption, never a hang, never a low-level walk error
  * (ArrayIndexOutOfBounds / NegativeArraySize / StackOverflow), which
  * would mean the framing walk itself lost track of its bounds.
  *
  * The corpus is seeded (deterministic across runs) and mixes pure
  * random buffers with structure-aware mutations of valid containers:
  * truncations at every boundary class, random byte flips, targeted
  * Content-Length digit flips, header-line mutations, seed splices,
  * garbage tails, and injected `WARC/1.0` / CRLF CRLF sequences —
  * plus a chunk-boundary invariance sweep over the incremental parser.
  */
class WarcFuzzSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(0x3a5c1)

  // --- valid seeds the mutators start from -------------------------------

  private lazy val seeds: Array[Array[Byte]] = {
    val sepTrap = "trap \r\n\r\nWARC/1.0\r\n payload with embedded separators"
    val magicTrap = "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 4\r\n"
    val nonAscii = "café naïve 日本語 text mixing byte widths"
    Array(
      Warc.buildContainer(Seq(
        (1L, "plain text long enough to make a couple of chunks maybe"),
        (2L, sepTrap),
        (3L, ""))),
      Warc.buildContainer(Seq((10L, magicTrap), (11L, nonAscii))),
      Warc.buildContainer(Seq((7L, "x" * 600))),
      Warc.buildContainer((20L to 24L).map(i => (i, s"doc number $i body")))
    )
  }

  // --- mutators ----------------------------------------------------------

  /** Flip one digit of one `Content-Length:` header value in place —
    * the verdict-named mutation class: framing arithmetic driven by a
    * corrupted length must either still tile exactly (the flip landed
    * harmlessly) or fail loudly (trailer check / bounds require).
    */
  private def flipContentLengthDigit(seed: Array[Byte]): Array[Byte] = {
    val b = seed.clone()
    val s = new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
    val hits = "Content-Length: ".r.findAllMatchIn(s).map(_.end).toSeq
    if (hits.nonEmpty) {
      val at = hits(rnd.nextInt(hits.length))
      // the value's digits run from `at` to the CR
      var end = at
      while (end < b.length && b(end) >= '0' && b(end) <= '9') end += 1
      if (end > at) {
        val o = at + rnd.nextInt(end - at)
        b(o) = ('0' + rnd.nextInt(10)).toByte
      }
    }
    b
  }

  private def mutate(seed: Array[Byte]): Array[Byte] = rnd.nextInt(8) match {
    case 0 => // truncate anywhere, including length 0 — every boundary class
      java.util.Arrays.copyOf(seed, rnd.nextInt(seed.length + 1))
    case 1 => // flip 1-8 random bytes
      val b = seed.clone()
      (0 until 1 + rnd.nextInt(8)).foreach { _ =>
        if (b.nonEmpty) b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      }
      b
    case 2 => flipContentLengthDigit(seed)
    case 3 => // mutate a byte inside the header region (first record's head)
      val b = seed.clone()
      val o = rnd.nextInt(math.min(b.length, 200))
      b(o) = rnd.nextInt(256).toByte
      b
    case 4 => // splice two seeds at random cut points
      val other = seeds(rnd.nextInt(seeds.length))
      java.util.Arrays.copyOf(seed, rnd.nextInt(seed.length + 1)) ++
        other.drop(rnd.nextInt(other.length + 1))
    case 5 => // random garbage tail
      seed ++ Array.fill(rnd.nextInt(256))(rnd.nextInt(256).toByte)
    case 6 => // inject the magic or the record separator mid-stream
      val ins = (if (rnd.nextBoolean()) "WARC/1.0\r\n" else "\r\n\r\n")
        .getBytes(UTF_8)
      val cut = rnd.nextInt(seed.length + 1)
      seed.take(cut) ++ ins ++ seed.drop(cut)
    case _ => // pure random of similar size
      Array.fill(math.max(1, rnd.nextInt(seed.length + 1)))(rnd.nextInt(256).toByte)
  }

  /** The loud-failure set the parser is ALLOWED to throw: require
    * (IllegalArgumentException), sys.error (RuntimeException), and a
    * corrupted numeric header (NumberFormatException from toLong/toInt).
    * Anything else — bounds errors, negative allocation, stack
    * overflow — is a walk bug the fuzz exists to catch.
    */
  private def isLoudIntentional(e: Throwable): Boolean = e match {
    case _: NumberFormatException => true
    case _: IllegalArgumentException => true
    case e: RuntimeException => e.getClass == classOf[RuntimeException]
    case _ => false
  }

  /** On a successful parse, the accounting must be EXACT: records tile
    * the container contiguously from offset 0, and each record's
    * framing arithmetic is internally consistent. parseHttp over each
    * payload must itself parse or fail loudly.
    */
  private def checkExact(buf: Array[Byte], recs: Seq[Warc.WarcRecord]): Long = {
    var acc = 0L
    var expect = 0L
    recs.foreach { r =>
      assert(r.offset == expect,
        s"record offset ${r.offset} leaves a gap (expected $expect)")
      assert(r.recLen > 0 && r.payload.length <= r.recLen)
      expect += r.recLen
      acc += r.payload.length
      try {
        val (status, body) = Warc.parseHttp(r.payload)
        acc += status + body.length
      } catch {
        case e: Throwable if isLoudIntentional(e) => acc += 1
      }
    }
    assert(expect == buf.length,
      s"records cover $expect of ${buf.length} container bytes")
    acc
  }

  test("10k random + structure-mutated containers: exact parse or loud failure") {
    var acc = 0L
    var parsed = 0
    var loud = 0
    var i = 0
    while (i < 10000) {
      val buf =
        if (i % 5 == 4) Array.fill(rnd.nextInt(2048))(rnd.nextInt(256).toByte)
        else mutate(seeds(i % seeds.length))
      try {
        acc += checkExact(buf, Warc.parseWarc(buf))
        parsed += 1
      } catch {
        case e: Throwable if isLoudIntentional(e) => loud += 1
        case e: Throwable =>
          fail(s"parser low-level error on fuzz case $i (${buf.length} bytes, " +
            s"head ${buf.take(24).map(b => f"$b%02x").mkString(" ")}): $e\n" +
            e.getStackTrace.take(8).mkString("\n"))
      }
      i += 1
    }
    // both outcome classes must actually occur, or the harness tests nothing
    assert(parsed > 100, s"only $parsed/10000 cases parsed — seeds broken?")
    assert(loud > 1000, s"only $loud/10000 cases failed loudly — mutators weak?")
    assert(acc != 42L) // consume the accumulator
  }

  test("incremental prefix parse is chunk-boundary invariant on valid containers") {
    // 2000 random chunkings: feeding a valid container through the
    // reassembler's parseWarcPrefix drain loop must produce exactly the
    // batch records regardless of where the chunk cuts land — including
    // inside the magic, the separator, and multi-byte UTF-8 payloads
    (0 until 2000).foreach { trial =>
      val seed = seeds(trial % seeds.length)
      val batch = Warc.parseWarc(seed)
      var pending = Array.empty[Byte]
      var base = 0L
      val got = Seq.newBuilder[Warc.WarcRecord]
      var pos = 0
      while (pos < seed.length) {
        val n = 1 + rnd.nextInt(97)
        val chunk = seed.slice(pos, math.min(seed.length, pos + n))
        pos += chunk.length
        val joined = pending ++ chunk
        val (recs, leftover) = Warc.parseWarcPrefix(joined, base)
        got ++= recs
        base += joined.length - leftover.length
        pending = leftover
      }
      assert(pending.isEmpty, s"trial $trial left ${pending.length} bytes")
      val g = got.result()
      assert(g.map(r => (r.offset, r.recLen, r.headers)) ==
        batch.map(r => (r.offset, r.recLen, r.headers)), s"trial $trial")
      g.zip(batch).foreach { case (a, b) =>
        assert(java.util.Arrays.equals(a.payload, b.payload), s"trial $trial")
      }
    }
  }

  // --- gz member walk ------------------------------------------------------

  /** Re-wrap a plain container as per-record gzip members (the writer's
    * gz layout), using the parsed record boundaries.
    */
  private def gzWrap(plain: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    Warc.parseWarc(plain).foreach { r =>
      out.write(Warc.gzipMember(java.util.Arrays.copyOfRange(
        plain, r.offset.toInt, (r.offset + r.recLen).toInt)))
    }
    out.toByteArray
  }

  test("6k mutated gz containers: exact member walk + parse, or loud failure") {
    val gzSeeds = seeds.map(gzWrap)
    var ok = 0
    var loud = 0
    (0 until 6000).foreach { i =>
      val seed = gzSeeds(i % gzSeeds.length)
      val buf =
        if (i % 7 == 0) seed // unmutated: the walk must succeed
        else if (i % 5 == 4)
          Array.fill(rnd.nextInt(2048))(rnd.nextInt(256).toByte)
        else mutate(seed)
      try {
        val plain = Warc.gunzipMembers(buf)
        // a walk that SUCCEEDS hands bytes to the framing seam, which
        // itself must parse exactly or fail loudly — same contract
        try { val a = checkExact(plain, Warc.parseWarc(plain)); assert(a != -1L) }
        catch { case e: Throwable if isLoudIntentional(e) => () }
        ok += 1
        if (i % 7 == 0)
          assert(java.util.Arrays.equals(plain, seeds(i % gzSeeds.length)),
            s"unmutated gz seed $i must inflate to its plain container")
      } catch {
        case e: Throwable if isLoudIntentional(e) => loud += 1
        case e: Throwable =>
          fail(s"gz walk low-level error on fuzz case $i (${buf.length} " +
            s"bytes, head ${buf.take(24).map(b => f"$b%02x").mkString(" ")})" +
            s": $e\n" + e.getStackTrace.take(8).mkString("\n"))
      }
    }
    assert(ok > 500, s"only $ok/6000 gz cases walked — seeds broken?")
    assert(loud > 1000, s"only $loud/6000 gz cases failed loudly — mutators weak?")
  }

  test("gz corruption classes each fail loudly: truncation, garbage, CRC, ISIZE, flags, method") {
    val rec = Warc.buildRecord(5L, "hello gz world with some body text")
    val member = Warc.gzipMember(rec)
    def loud(b: Array[Byte], what: String): Unit = {
      val e = intercept[Exception](Warc.gunzipMembers(b))
      assert(isLoudIntentional(e), s"$what: $e")
    }
    // truncation at EVERY interior byte: always loud (a member is
    // atomic — header, deflate stream, and 8-byte trailer all required)
    (1 until member.length).foreach { cut =>
      loud(java.util.Arrays.copyOf(member, cut), s"truncate@$cut")
    }
    loud(member ++ "trailing garbage".getBytes(UTF_8), "garbage tail")
    val c = member.clone()
    c(c.length - 8) = (c(c.length - 8) ^ 1).toByte
    loud(c, "CRC32 trailer flip")
    val z = member.clone()
    z(z.length - 4) = (z(z.length - 4) ^ 1).toByte
    loud(z, "ISIZE trailer flip")
    val f = member.clone()
    f(3) = (f(3) | 0x80).toByte
    loud(f, "reserved FLG bit")
    val m = member.clone()
    m(2) = 7
    loud(m, "non-deflate method")
    // and the empty container is the empty archive, not an error
    assert(Warc.gunzipMembers(Array.empty).isEmpty)
  }

  test("gz optional header fields (FEXTRA/FNAME/FCOMMENT/FHCRC) parse per RFC 1952") {
    // real gzip writers emit FNAME routinely; rebuild the member with
    // every optional field present — the walk must skip them and still
    // inflate the identical record bytes
    val rec = Warc.buildRecord(9L, "flagged header doc body")
    val member = Warc.gzipMember(rec)
    val deflateAndTrailer = member.drop(10)
    val extra = Array[Byte](3, 0, 1, 2, 3) // XLEN=3 LE + payload
    val name = "shard.warc".getBytes(UTF_8) :+ 0.toByte
    val comment = "written by fuzz".getBytes(UTF_8) :+ 0.toByte
    val hcrc = Array[Byte](0x42, 0x17) // skipped, not verified
    val flg = (2 | 4 | 8 | 16).toByte
    val hdr = Array[Byte](0x1f.toByte, 0x8b.toByte, 8, flg,
      0, 0, 0, 0, 0, 0)
    val flagged = hdr ++ extra ++ name ++ comment ++ hcrc ++ deflateAndTrailer
    assert(java.util.Arrays.equals(Warc.gunzipMembers(flagged), rec))
    // two members, one flagged one plain, still concatenate
    assert(java.util.Arrays.equals(Warc.gunzipMembers(flagged ++ member),
      rec ++ rec))
    // an unterminated FNAME is loud, not a scan off the end
    val unterminated = hdr ++ extra ++ name.dropRight(1)
    val e = intercept[Exception](Warc.gunzipMembers(unterminated))
    assert(isLoudIntentional(e))
  }

  test("2k random mixed-type containers: responses filter exactly, other types count, never an error") {
    // random interleavings of response records with warcinfo/request/
    // metadata/revisit/(missing-type) records: the frame must tile
    // exactly, the response filter must pick exactly the responses,
    // and no record TYPE may ever cause a failure (type handling is
    // skip-and-count; only structural corruption is loud)
    val auxTypes = Seq("warcinfo", "request", "metadata", "revisit",
      "conversion", "resource", "continuation", "UNKNOWN-FUTURE-TYPE")
    (0 until 2000).foreach { trial =>
      val parts = (0 until 1 + rnd.nextInt(8)).map { j =>
        if (rnd.nextBoolean())
          (true, Warc.buildRecord(trial * 100L + j, s"doc $trial-$j body"))
        else if (rnd.nextInt(8) == 0) {
          // a record MISSING its WARC-Type header: structurally valid,
          // reads as the countable pseudo-type, never a response
          val payload = s"untyped $j".getBytes(UTF_8)
          (false, (s"WARC/1.0\r\nWARC-Record-ID: <urn:graft:aux-$j>\r\n" +
            s"Content-Length: ${payload.length}\r\n\r\n").getBytes(UTF_8) ++
            payload ++ "\r\n\r\n".getBytes(UTF_8))
        } else {
          val t = auxTypes(rnd.nextInt(auxTypes.length))
          val payload = Array.fill(rnd.nextInt(64))(
            (32 + rnd.nextInt(95)).toByte) // printable, never CRLF CRLF
          (false, Warc.buildAuxRecord(t, trial * 100L + j, payload))
        }
      }
      val container = parts.map(_._2).reduce(_ ++ _)
      val recs = Warc.parseWarc(container)
      assert(recs.length == parts.length, s"trial $trial record count")
      assert(recs.map(_.recLen).sum == container.length.toLong)
      val responses = recs.filter(Warc.isResponse)
      assert(responses.length == parts.count(_._1), s"trial $trial")
      // the gz transport agrees: per-record members, same filtering
      if (trial % 10 == 0) {
        val gz = parts.map(p => Warc.gzipMember(p._2)).reduce(_ ++ _)
        val infl = Warc.gunzipMembers(gz)
        assert(java.util.Arrays.equals(infl, container), s"trial $trial gz")
      }
    }
  }

  test("truncation at EVERY byte of a small container is incomplete or a clean prefix") {
    // exhaustive boundary sweep: a prefix either frames k leading records
    // exactly (cut on a record boundary), parses a strict prefix with
    // leftover (cut mid-record), or fails loudly (never a walk error)
    val seed = Warc.buildContainer(Seq((1L, "alpha beta"), (2L, "")))
    val batch = Warc.parseWarc(seed)
    (0 to seed.length).foreach { cut =>
      val buf = java.util.Arrays.copyOf(seed, cut)
      try {
        val (recs, leftover) = Warc.parseWarcPrefix(buf, 0L)
        assert(recs.length <= batch.length)
        recs.zip(batch).foreach { case (a, b) =>
          assert(a.offset == b.offset && a.recLen == b.recLen, s"cut $cut")
        }
        assert(recs.map(_.recLen).sum + leftover.length == cut, s"cut $cut")
      } catch {
        case e: Throwable if isLoudIntentional(e) => // loud is allowed
      }
    }
  }
}
