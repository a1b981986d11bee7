package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Randomized robustness harness for the zero-dependency binary parsers
  * (BMP/WAV header walks, RIFF/AVI demux, ImageIO-backed GIF/JPEG paths).
  * These run attacker-shaped bytes at fleet scale inside executor tasks,
  * so the contract under ANY input is: parse, or land in the clean
  * raw-fallback / honest-absence path — never throw, hang, or balloon
  * memory. The corpus is seeded (deterministic across runs) and mixes
  * pure-random buffers with STRUCTURE-AWARE mutations of valid seeds:
  * truncations, random byte flips, 0xFFFFFFFF / huge size stamps,
  * zero- and negative-dimension headers, overflow-bait widths, deep
  * LIST nesting, and self-referential LIST sizes.
  */
class MultimodalFuzzSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(0x5eed6)

  // --- valid seeds the mutators start from -------------------------------

  private def jpegBytes(color: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, color)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    baos.toByteArray
  }

  private def gifBytes(colors: Seq[Int]): Array[Byte] = {
    import javax.imageio.{IIOImage, ImageIO}
    val baos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(baos)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    colors.foreach { c =>
      val f = new java.awt.image.BufferedImage(
        8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8) f.setRGB(x, y, c)
      writer.writeToSequence(new IIOImage(f, null, null), null)
    }
    writer.endWriteSequence(); writer.dispose(); ios.close()
    baos.toByteArray
  }

  /** Minimal AVI-MJPEG container (mirrors MultimodalSpec's builder). */
  private def aviBytes(frames: Seq[Array[Byte]]): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length & 1
      val bb = ByteBuffer.allocate(8 + body.length + pad).order(ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
      bb.array()
    }
    def list(t: String, bodies: Array[Byte]*): Array[Byte] = {
      val payload = bodies.flatten.toArray
      val bb = ByteBuffer.allocate(12 + payload.length).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("LIST".getBytes("US-ASCII")).putInt(4 + payload.length)
        .put(t.getBytes("US-ASCII")).put(payload)
      bb.array()
    }
    val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    avih.putInt(40000).putInt(0).putInt(0).putInt(0).putInt(frames.size)
    val hdrl = list("hdrl", chunk("avih", avih.array()))
    val movi = list("movi", frames.map(chunk("00dc", _)): _*)
    val body = hdrl ++ movi
    val bb = ByteBuffer.allocate(12 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + body.length)
      .put("AVI ".getBytes("US-ASCII")).put(body)
    bb.array()
  }

  private lazy val seeds: Array[Array[Byte]] = {
    val text = "the quick brown fox jumps over the lazy dog " * 8
    Array(
      Multimodal.buildBmp(16, 12, text.getBytes),
      Multimodal.buildBmp(1, 1, Array[Byte](1, 2, 3)),
      Multimodal.buildWav(16000, text.getBytes),
      Multimodal.buildWav(8000, Array[Byte]()),
      aviBytes(Seq(jpegBytes(0xFF0000), jpegBytes(0x00FF00))),
      gifBytes(Seq(0xFF0000, 0x00FF00, 0x0000FF)),
      jpegBytes(0x123456)
    )
  }

  // --- mutators ----------------------------------------------------------

  private def mutate(seed: Array[Byte]): Array[Byte] = rnd.nextInt(6) match {
    case 0 => // truncate anywhere, including length 0
      java.util.Arrays.copyOf(seed, rnd.nextInt(seed.length + 1))
    case 1 => // flip 1-8 random bytes
      val b = seed.clone()
      (0 until 1 + rnd.nextInt(8)).foreach { _ =>
        if (b.nonEmpty) b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      }
      b
    case 2 => // stamp an adversarial 32-bit size/dimension somewhere
      val b = seed.clone()
      if (b.length >= 4) {
        val o = rnd.nextInt(b.length - 3)
        val v = Seq(0xFFFFFFFF, 0x7FFFFFFF, 0x40000000, 0x80000000,
          0, -1, b.length * 2)(rnd.nextInt(7))
        b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
        b(o + 2) = ((v >> 16) & 0xff).toByte; b(o + 3) = ((v >> 24) & 0xff).toByte
      }
      b
    case 3 => // splice two seeds at random cut points
      val other = seeds(rnd.nextInt(seeds.length))
      java.util.Arrays.copyOf(seed, rnd.nextInt(seed.length + 1)) ++
        other.drop(rnd.nextInt(other.length + 1))
    case 4 => // random garbage tail
      seed ++ Array.fill(rnd.nextInt(256))(rnd.nextInt(256).toByte)
    case _ => // pure random of similar size
      Array.fill(math.max(1, rnd.nextInt(seed.length + 1)))(rnd.nextInt(256).toByte)
  }

  /** Every parser entry point, forced to completion. Returns a token so
    * the JIT can't elide the work.
    */
  private def runAll(buf: Array[Byte]): Long = {
    var acc = 0L
    val meta = Multimodal.decode(Multimodal.MediaBlob(1L, "image", buf))
    acc += meta.byte_len + meta.n_frames
    acc += Multimodal.parseWav(buf).map(_._1.toLong).getOrElse(0L)
    Multimodal.BmpPixelDecoder.decode(buf).foreach(img =>
      acc += Multimodal.aHash64(img))
    Multimodal.ImageIoPixelDecoder.decode(buf).foreach(img =>
      acc += Multimodal.aHash64(img))
    Multimodal.AviMjpegFrameDecoder.decode(buf).foreach(f => acc += f.frame_crc)
    Multimodal.ImageIoGifFrameDecoder.decode(buf).foreach(f => acc += f.frame_crc)
    // the m7 signature views walk the same containers — force them too
    Multimodal.AviMjpegFrameDecoder.signatures(buf).foreach(s => acc += s.hist(0))
    Multimodal.ImageIoGifFrameDecoder.signatures(buf).foreach(s => acc += s.hist(0))
    Multimodal.RawSceneDecoder().signatures(buf).foreach(s => acc += s.hist(15))
    acc
  }

  test("10k random + structure-mutated buffers: parse or fall back, never throw") {
    var acc = 0L
    var i = 0
    while (i < 10000) {
      val buf =
        if (i % 5 == 4) Array.fill(rnd.nextInt(2048))(rnd.nextInt(256).toByte)
        else mutate(seeds(i % seeds.length))
      try acc += runAll(buf)
      catch {
        case e: Throwable =>
          val hdr = if (buf.length >= 54) {
            val bb = java.nio.ByteBuffer.wrap(buf)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            s" off=${bb.getInt(10)} w=${bb.getInt(18)} h=${bb.getInt(22)}"
          } else ""
          fail(s"parser threw on fuzz case $i (${buf.length} bytes,$hdr " +
            s"head ${buf.take(16).map(b => f"$b%02x").mkString(" ")}): $e\n" +
            e.getStackTrace.take(8).mkString("\n"))
      }
      i += 1
    }
    assert(acc != 42L) // consume the accumulator
  }

  test("deeply nested LIST headers walk iteratively (no stack overflow)") {
    // one 12-byte LIST frame per level, ~85k levels in 1 MB: the recursive
    // walk would need ~85k stack frames and die in StackOverflowError
    val depth = 85000
    val total = 12 + depth * 12
    val b = new Array[Byte](total)
    def put4(o: Int, s: String): Unit = {
      var i = 0; while (i < 4) { b(o + i) = s.charAt(i).toByte; i += 1 }
    }
    def putU32(o: Int, v: Long): Unit = {
      b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
      b(o + 2) = ((v >> 16) & 0xff).toByte; b(o + 3) = ((v >> 24) & 0xff).toByte
    }
    put4(0, "RIFF"); putU32(4, total - 8); put4(8, "AVI ")
    var o = 12
    var level = 0
    while (level < depth) {
      val remaining = total - o - 8 // chunk body size from here to the end
      put4(o, "LIST"); putU32(o + 4, remaining); put4(o + 8, "hdra")
      o += 12
      level += 1
    }
    assert(Multimodal.AviMjpegFrameDecoder.decode(b).isEmpty,
      "nested-LIST bomb must terminate cleanly with no frames")
  }

  test("self-referential and zero-size LIST chunks terminate the walk") {
    import java.nio.{ByteBuffer, ByteOrder}
    // LIST whose size points back at itself / zero-size chunks repeated
    val bb = ByteBuffer.allocate(12 + 24 * 12).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + 24 * 12)
      .put("AVI ".getBytes("US-ASCII"))
    (0 until 24).foreach { _ =>
      bb.put("LIST".getBytes("US-ASCII")).putInt(0).putInt(0)
    }
    assert(Multimodal.AviMjpegFrameDecoder.decode(bb.array()).isEmpty)
  }

  test("crafted huge-dimension headers are rejected before allocation") {
    // BMP declaring width 2^30: w*3 overflows Int; the Long row-size math
    // must reject it instead of misindexing
    val bmp = Multimodal.buildBmp(16, 12, "pixels".getBytes)
    val bb = java.nio.ByteBuffer.wrap(bmp).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(18, 0x40000000)
    assert(Multimodal.BmpPixelDecoder.decode(bmp).isEmpty)
    // WAV with bits-per-sample 4: bytes-per-frame rounds to 0 and must
    // fall back to raw, not divide by zero
    val wav = Multimodal.buildWav(16000, "audio data bytes".getBytes)
    val wb = java.nio.ByteBuffer.wrap(wav).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    wb.putShort(34, 4)
    val meta = Multimodal.decode(Multimodal.MediaBlob(1L, "audio", wav))
    assert(meta.format == "raw", s"bits=4 WAV must fall back, got ${meta.format}")
  }
}
