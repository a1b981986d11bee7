package graft

import org.apache.spark.sql.SaveMode

import graft.operators.Multimodal

/** Multimodal semantics on crafted payloads: chunk/stride coverage
  * arithmetic over the parsed PCM data section (m3), frame fan-out counts
  * (m2), and REAL header parsing (m1): synthesized byte-valid BMP/WAV
  * containers must parse back to the exact dimensions/rates they were
  * built with; malformed payloads must fall back to "raw" rather than
  * misparse.
  */
/** Top-level fixtures so decoder instances serialize without dragging the
  * (non-serializable) suite into the mapPartitions closure.
  */
object MultimodalSpecFixtures {
  /** A stand-in codec: 6 fixed "frames" at 1-second timestamps with
    * synthetic digests — exercises the FrameDecoder seam end to end.
    */
  object FakeDecoder extends Multimodal.FrameDecoder {
    override def decode(payload: Array[Byte]): Iterator[Multimodal.DecodedFrame] =
      Iterator.range(0, 6).map(i => Multimodal.DecodedFrame(i, i * 1000L, i * 7L))
  }
}

class MultimodalSpec extends SparkSpec {

  /** doc_id chosen so pmod(id,3) lands the wanted modality:
    * 0→audio? mediaBlobs maps (id%3): 0→image? element_at 1-based with
    * pmod+1 → id%3==0→"image", 1→"audio", 2→"video".
    */
  private def writeDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = tempSfDir()
    rows.map { case (id, text) => (id, text, "en", "s0", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    dir
  }

  test("m3 chunks tile the payload with the configured overlap") {
    // doc 1 -> audio (1 % 3 == 1); payload 10 bytes, chunk 4, stride 3:
    // starts 0,3,6,9 with lengths 4,4,4,1
    val dir = writeDocs(Seq((1L, "0123456789")))
    val got = Multimodal.audioChunks(spark, dir, chunkBytes = 4, strideBytes = 3)
      .collect().sortBy(_.chunk_idx)
      .map(c => (c.chunk_idx, c.start_byte, c.n_bytes))
    assert(got.toSeq == Seq((0, 0L, 4), (1, 3L, 4), (2, 6L, 4), (3, 9L, 1)),
      s"got ${got.toSeq}")
  }

  test("m3 consecutive chunks share chunk-minus-stride bytes") {
    val dir = writeDocs(Seq((1L, "abcdefgh"))) // 8 bytes, chunk 4 stride 2
    val chunks = Multimodal.audioChunks(spark, dir, chunkBytes = 4, strideBytes = 2)
      .collect().sortBy(_.chunk_idx)
    // starts 0,2,4,6: overlap = 2 bytes between neighbors
    assert(chunks.map(_.start_byte).toSeq == Seq(0L, 2L, 4L, 6L))
    val text = "abcdefgh"
    chunks.sliding(2).foreach { case Array(a, b) =>
      val aEnd = a.start_byte + a.n_bytes
      assert(aEnd - b.start_byte == math.min(2, a.n_bytes),
        s"chunks ${a.chunk_idx},${b.chunk_idx} overlap wrong")
      val slice = text.substring(b.start_byte.toInt, b.start_byte.toInt + b.n_bytes)
      val crc = new java.util.zip.CRC32()
      crc.update(slice.getBytes)
      assert(b.chunk_crc == crc.getValue, "chunk crc must hash the slice bytes")
    }
  }

  test("m2 frame fan-out emits every Nth frame of the stubbed decode") {
    // doc 2 -> video (2 % 3 == 2); 100 bytes -> n_frames = 100/1024 + 1 = 1
    val dir = writeDocs(Seq((2L, "x" * 100), (5L, "y" * 5000)))
    val got = Multimodal.frameSamples(spark, dir, everyNth = 2)
      .collect().groupBy(_.doc_id).view.mapValues(_.length).toMap
    // doc 2: 1 frame -> idx 0 only; doc 5: 5000/1024+1 = 5 frames -> 0,2,4
    assert(got == Map(2L -> 1, 5L -> 3))
  }

  test("m2 codec seam: a fake decoder slots in without operator changes") {
    // same operator, same schema, same fan-out plan — only the decoder
    // swaps, which is the real-codec upgrade path
    val dir = writeDocs(Seq((2L, "x" * 100))) // doc 2 -> video
    val got = Multimodal.frameSamples(spark, dir, everyNth = 2,
      decoder = MultimodalSpecFixtures.FakeDecoder)
      .collect().sortBy(_.frame_idx)
      .map(f => (f.frame_idx, f.ts_ms, f.frame_crc))
    assert(got.toSeq == Seq((0, 0L, 0L), (2, 2000L, 14L), (4, 4000L, 28L)),
      s"got ${got.toSeq}")
  }

  test("m1 parses the synthesized containers back to their build parameters") {
    val dir = writeDocs(Seq((1L, "hello"), (2L, "hello"), (3L, "hello"), (10L, "hi")))
    val rows = Multimodal.mediaMetadata(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap

    // doc 1 -> audio: mono PCM16 WAV at 8000 + 4000*((1/3)%3) = 8000 Hz;
    // "hello" (5 bytes) pads to 6 -> 3 samples, 44+6 container bytes
    val a = rows(1L)
    assert(a.getAs[String]("media_type") == "audio" && a.getAs[String]("format") == "wav")
    assert(a.getAs[Int]("sample_rate") == 8000)
    assert(a.getAs[Long]("byte_len") == 50L)
    assert(a.getAs[Int]("n_frames") == 3)

    // doc 10 -> audio at 8000 + 4000*((10/3)%3) = 8000 Hz? 10/3=3, 3%3=0 -> 8000
    assert(rows(10L).getAs[Int]("sample_rate") == 8000)

    // doc 2 -> video: opaque raw payload, honest zero dims, fallback framing
    val v = rows(2L)
    assert(v.getAs[String]("format") == "raw")
    assert(v.getAs[Long]("byte_len") == 5L && v.getAs[Int]("n_frames") == 1)
    assert(v.getAs[Int]("width") == 0 && v.getAs[Int]("sample_rate") == 0)

    // doc 3 -> image: 24bpp BMP, width 1+3%31=4, height 1+3%17=4,
    // row size 12 -> 54 + 48 bytes
    val i = rows(3L)
    assert(i.getAs[String]("format") == "bmp")
    assert(i.getAs[Int]("width") == 4 && i.getAs[Int]("height") == 4)
    assert(i.getAs[Long]("byte_len") == 102L)
  }

  test("wav parse walks chunks and rejects malformed payloads") {
    // parse-back across rates and odd/even data lengths
    for ((rate, txt) <- Seq((8000, "abc"), (12000, "abcd"), (44100, ""))) {
      val wav = Multimodal.buildWav(rate, txt.getBytes)
      val Some((r, ch, bits, off, len)) = Multimodal.parseWav(wav)
      assert(r == rate && ch == 1 && bits == 16 && off == 44)
      assert(len == txt.length + (txt.length & 1), s"padded data for '$txt'")
    }
    // truncated RIFF, lying chunk size, and a BMP are all non-WAVs
    assert(Multimodal.parseWav("RIFF".getBytes).isEmpty)
    val lying = Multimodal.buildWav(8000, "abcd".getBytes)
    val bb = java.nio.ByteBuffer.wrap(lying).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(40, 9999) // data chunk claims more bytes than exist
    assert(Multimodal.parseWav(lying).isEmpty)
    assert(Multimodal.parseWav(Multimodal.buildBmp(2, 2, "x".getBytes)).isEmpty)
  }

  test("decode identifies a hand-built BMP and survives junk") {
    val bmp = Multimodal.buildBmp(7, 5, "pix".getBytes)
    val m = Multimodal.decode(Multimodal.MediaBlob(1L, "image", bmp))
    assert(m.format == "bmp" && m.width == 7 && m.height == 5)
    assert(m.byte_len == 54 + 24 * 5) // row size ((7*3+3)/4)*4 = 24, 5 rows
    val junk = Multimodal.decode(Multimodal.MediaBlob(2L, "video", Array[Byte](1, 2, 3)))
    assert(junk.format == "raw" && junk.n_frames == 1)
  }

  test("m4 aHash is a pixel fingerprint: same pixels same hash, inverted pixels differ") {
    val a = Multimodal.aHash64(Multimodal.buildBmp(16, 16, "some pixel soup".getBytes)).get
    val b = Multimodal.aHash64(Multimodal.buildBmp(16, 16, "some pixel soup".getBytes)).get
    assert(a == b, "identical pixels must fingerprint identically")
    // different content at the same dimensions moves many grid cells
    val c = Multimodal.aHash64(Multimodal.buildBmp(16, 16,
      "completely different content here!!".getBytes)).get
    assert(java.lang.Long.bitCount(a ^ c) > 3, s"hamming ${java.lang.Long.bitCount(a ^ c)}")
    // non-BMP payloads produce no hash (honest absence)
    assert(Multimodal.aHash64("not a bmp".getBytes).isEmpty)
  }

  test("m4 banded join finds near-identical images and skips distinct ones") {
    import spark.implicits._
    // two identical-pixel images (hamming 0), one same-size different image,
    // one noisy twin of doc 1 with a single flipped low bit (hamming 1)
    val h1 = Multimodal.aHash64(Multimodal.buildBmp(16, 16, "soup".getBytes)).get
    val hashes = Seq(
      (1L, 16, 16, h1),
      (2L, 16, 16, h1),
      (3L, 16, 16, Multimodal.aHash64(
        Multimodal.buildBmp(16, 16, "other stuff".getBytes)).get),
      (4L, 16, 16, h1 ^ 1L))
      .toDF("doc_id", "width", "height", "ahash64")
    val got = Multimodal.imageNearDupPairs(hashes)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 0L), (1L, 4L, 1L), (2L, 4L, 1L)), s"got $got")
  }

  test("m9 audit emits every band-sharing pair with exact hamming and the <=3 verdict") {
    // end-to-end through the BMP decode: ids 0/3/6/9 are images. Expected
    // rows replicated independently from the per-payload aHashes + the
    // 4x16-bit banding rule, so the operator's banding/hamming can never
    // drift from the documented pigeonhole contract unnoticed.
    // 0 and 1581 (= 3·lcm(31,17)) get IDENTICAL id-derived dimensions, so
    // the same text makes byte-identical pixels: hamming 0, near_dup true
    // — the one guaranteed collision; 3 and 9 are unrelated fillers
    val texts = Seq(0L -> "img zero", 1581L -> "img zero",
      3L -> "img three", 9L -> "img nine?")
    val dir = writeDocs(texts)
    def hashOf(id: Long, t: String): Long = Multimodal.aHash64(
      Multimodal.buildBmp(1 + (id % 31).toInt, 1 + (id % 17).toInt,
        t.getBytes("UTF-8"))).get
    val hs = texts.map { case (id, t) => id -> hashOf(id, t) }
    val expected = (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      if (0 until 4).exists(k => ((ha >> (k * 16)) & 0xFFFFL) == ((hb >> (k * 16)) & 0xFFFFL))
    } yield {
      val ham = java.lang.Long.bitCount(ha ^ hb).toLong
      (a, b, ham, ham <= 3)
    }).toSet
    assert(expected.nonEmpty,
      "fixture must produce band collisions or the equality below is vacuous")
    val got = Multimodal.mediaNearDup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    assert(got == expected, s"got $got expected $expected")
  }

  test("m4 image hashes are emitted for every image-modality doc") {
    val dir = writeDocs(Seq((0L, "img zero"), (3L, "img three"), (1L, "audio")))
    val got = Multimodal.imageHashes(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    // ids 0 and 3 are images (id % 3 == 0); dims are id-derived
    assert(got.toSeq == Seq((0L, 1, 1), (3L, 4, 4)))
  }

  test("m5 thumbnail digest: integer nearest-neighbor resize, fold replayed independently") {
    val bmp = Multimodal.buildBmp(8, 8, "thumb fixture bytes".getBytes)
    val img = Multimodal.BmpPixelDecoder.decode(bmp).get
    // independent reimplementation: same grid addressing, wrapping poly-31
    // over (r,g,b) per cell in row-major order, integer luminance mean
    val M = BigInt(2).pow(64)
    var h = BigInt(0)
    var lumSum = 0L
    for (j <- 0 until 4; i <- 0 until 4) {
      val v = img.rgb(i * img.width / 4, j * img.height / 4)
      val chans = Seq((v >> 16) & 0xff, (v >> 8) & 0xff, v & 0xff)
      chans.foreach(c => h = (h * 31 + c) % M)
      lumSum += (299 * chans(0) + 587 * chans(1) + 114 * chans(2)) / 1000
    }
    val signed = (if (h >= BigInt(2).pow(63)) h - M else h).toLong
    val got = Multimodal.thumbDigest(img, 4)
    assert(got == (lumSum / 16, signed), s"got $got")
    // the JDK codec behind the same seam produces the identical digest
    val viaIo = Multimodal.ImageIoPixelDecoder.decode(bmp)
      .map(Multimodal.thumbDigest(_, 4)).get
    assert(viaIo == got, "ImageIO thumbnail digest must match the hand parser")
  }

  test("ImageIO pixel seam matches the zero-lib BMP decoder bit for bit, BMP and PNG") {
    // a real JDK codec behind the same PixelDecoder seam: same payload,
    // same pixels, same fingerprint — and a lossless PNG re-encode of the
    // same pixels fingerprints identically too
    val bmp = Multimodal.buildBmp(23, 11, "lossless pixel soup fixture".getBytes)
    val viaZeroLib = Multimodal.aHash64(bmp).get
    val viaImageIo = Multimodal.ImageIoPixelDecoder.decode(bmp)
      .map(Multimodal.aHash64).get
    assert(viaZeroLib == viaImageIo, "ImageIO BMP pixels must match the hand parser")

    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bmp))
    val png = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", png))
    val viaPng = Multimodal.ImageIoPixelDecoder.decode(png.toByteArray)
      .map(Multimodal.aHash64).get
    assert(viaPng == viaZeroLib, "PNG is lossless: identical pixels, identical aHash")
    // the seam still reports honest absence on junk
    assert(Multimodal.ImageIoPixelDecoder.decode("not an image".getBytes).isEmpty)
  }

  test("JPEG decodes through the pixel seam; aHash survives the lossy re-encode") {
    // smooth horizontal gradient: sampled grid luminances are 32 apart, so
    // JPEG's small smooth-region error cannot cross the mean threshold
    val img = new java.awt.image.BufferedImage(
      64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64) {
      val v = x * 4
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val png = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", png)
    val jpg = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpeg", jpg))
    val hPng = Multimodal.ImageIoPixelDecoder.decode(png.toByteArray)
      .map(Multimodal.aHash64).get
    val hJpg = Multimodal.ImageIoPixelDecoder.decode(jpg.toByteArray)
      .map(Multimodal.aHash64).get
    assert(java.lang.Long.bitCount(hPng ^ hJpg) <= 2,
      s"aHash must be robust to JPEG re-encode, hamming ${java.lang.Long.bitCount(hPng ^ hJpg)}")
  }

  test("m4 through the operator: ImageIO decoder reproduces the zero-lib hashes") {
    // the full distributed path with the real codec swapped in at the
    // seam — identical rows on the synthesized BMP corpus
    val dir = writeDocs(Seq((0L, "img zero pixels"), (3L, "img three pixels"),
      (6L, "a third image with longer text"), (1L, "audio")))
    val zeroLib = Multimodal.imageHashes(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    val imageIo = Multimodal.imageHashes(spark, dir, Multimodal.ImageIoPixelDecoder)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(zeroLib.nonEmpty && zeroLib.toSeq == imageIo.toSeq,
      s"zero-lib ${zeroLib.toSeq} vs ImageIO ${imageIo.toSeq}")
  }

  /** Independent replica of the decoders' rasterCrc convention: logical
    * width/height big-endian, then the packed top-down RGB raster.
    */
  private def refRasterCrc(img: java.awt.image.BufferedImage): Long = {
    val crc = new java.util.zip.CRC32()
    crcDims(crc, img.getWidth, img.getHeight)
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val v = img.getRGB(x, y) & 0xFFFFFF
      crc.update(v >> 16); crc.update((v >> 8) & 0xff); crc.update(v & 0xff)
    }
    crc.getValue
  }

  private def crcDims(crc: java.util.zip.CRC32, w: Int, h: Int): Unit = {
    crc.update((w >>> 24) & 0xff); crc.update((w >>> 16) & 0xff)
    crc.update((w >>> 8) & 0xff); crc.update(w & 0xff)
    crc.update((h >>> 24) & 0xff); crc.update((h >>> 16) & 0xff)
    crc.update((h >>> 8) & 0xff); crc.update(h & 0xff)
  }

  test("animated GIF decodes to per-frame digests through the m2 FrameDecoder seam") {
    import javax.imageio.{IIOImage, ImageIO}
    // three 16x16 solid-primary frames: pure colors survive GIF
    // palettization exactly, so frame digests are predictable
    val colors = Seq(0xFF0000, 0x00FF00, 0x0000FF)
    val frames = colors.map { c =>
      val f = new java.awt.image.BufferedImage(
        16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16) f.setRGB(x, y, c)
      f
    }
    val baos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(baos)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach(f => writer.writeToSequence(new IIOImage(f, null, null), null))
    writer.endWriteSequence()
    writer.dispose()
    ios.close()

    val got = Multimodal.ImageIoGifFrameDecoder.decode(baos.toByteArray).toSeq
    assert(got.map(_.frame_idx) == Seq(0, 1, 2))
    // no per-frame delay metadata was written -> 40 ms/frame fallback
    assert(got.map(_.ts_ms) == Seq(0L, 40L, 80L), s"got ${got.map(_.ts_ms)}")
    val expectedCrcs = colors.map { c =>
      val crc = new java.util.zip.CRC32()
      crcDims(crc, 16, 16)
      for (_ <- 0 until 256) {
        crc.update((c >> 16) & 0xff); crc.update((c >> 8) & 0xff); crc.update(c & 0xff)
      }
      crc.getValue
    }
    assert(got.map(_.frame_crc) == expectedCrcs,
      "decoded rasters must digest to the source colors")
    assert(got.map(_.frame_crc).distinct.size == 3, "distinct frames, distinct digests")
    // a non-GIF payload yields no frames instead of misparsing
    assert(Multimodal.ImageIoGifFrameDecoder.decode("raw video bytes".getBytes).isEmpty)
  }

  test("optimized GIF partial frames composite onto the logical-screen canvas") {
    import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier}
    import javax.imageio.metadata.IIOMetadataNode
    import java.awt.image.BufferedImage
    // frame 0: full 16x16 red; frame 1: an 8x8 green PATCH at (4,4) — the
    // optimized-GIF shape. The frame a viewer shows (and the digest must
    // cover) is red with a green center, not the bare 8x8 sub-raster.
    def solid(w: Int, h: Int, c: Int): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, c)
      img
    }
    val full = solid(16, 16, 0xFF0000)
    val patch = solid(8, 8, 0x00FF00)
    val baos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(baos)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    val spec = ImageTypeSpecifier.createFromBufferedImageType(
      BufferedImage.TYPE_INT_RGB)
    def metaAt(left: Int, top: Int, w: Int, h: Int) = {
      val m = writer.getDefaultImageMetadata(spec, null)
      val fmt = "javax_imageio_gif_image_1.0"
      val root = new IIOMetadataNode(fmt)
      val desc = new IIOMetadataNode("ImageDescriptor")
      desc.setAttribute("imageLeftPosition", left.toString)
      desc.setAttribute("imageTopPosition", top.toString)
      desc.setAttribute("imageWidth", w.toString)
      desc.setAttribute("imageHeight", h.toString)
      desc.setAttribute("interlaceFlag", "FALSE")
      root.appendChild(desc)
      m.mergeTree(fmt, root)
      m
    }
    writer.prepareWriteSequence(null)
    writer.writeToSequence(new IIOImage(full, null, metaAt(0, 0, 16, 16)), null)
    writer.writeToSequence(new IIOImage(patch, null, metaAt(4, 4, 8, 8)), null)
    writer.endWriteSequence()
    writer.dispose()
    ios.close()

    val got = Multimodal.ImageIoGifFrameDecoder.decode(baos.toByteArray).toSeq
    assert(got.map(_.frame_idx) == Seq(0, 1))
    val composed = solid(16, 16, 0xFF0000)
    for (y <- 4 until 12; x <- 4 until 12) composed.setRGB(x, y, 0x00FF00)
    assert(got(0).frame_crc == refRasterCrc(full),
      "first frame digests the full canvas")
    assert(got(1).frame_crc == refRasterCrc(composed),
      "partial frame must digest the composited canvas, not the sub-raster")
  }

  // --- AVI/MJPEG: the real video-container path through the m2 seam ------

  private def jpegBytes(color: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, color)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    baos.toByteArray
  }

  /** Minimal structurally-valid AVI-MJPEG: RIFF(AVI ) → LIST hdrl
    * (avih + LIST strl (strh 'vids'/'MJPG' + strf BITMAPINFOHEADER)) →
    * LIST movi ('00dc' chunks, word-aligned). Little-endian throughout.
    */
  private def aviMjpeg(frames: Seq[Array[Byte]], usPerFrame: Int): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length & 1
      val bb = ByteBuffer.allocate(8 + body.length + pad).order(ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
      bb.array()
    }
    def list(listType: String, bodies: Array[Byte]*): Array[Byte] = {
      val payload = bodies.flatten.toArray
      val bb = ByteBuffer.allocate(12 + payload.length).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("LIST".getBytes("US-ASCII")).putInt(4 + payload.length)
        .put(listType.getBytes("US-ASCII")).put(payload)
      bb.array()
    }
    val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    avih.putInt(usPerFrame).putInt(0).putInt(0).putInt(0)
      .putInt(frames.size).putInt(0).putInt(1).putInt(0)
      .putInt(16).putInt(16) // dwWidth, dwHeight
    val strh = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    strh.put("vids".getBytes("US-ASCII")).put("MJPG".getBytes("US-ASCII"))
      .putInt(0).putShort(0).putShort(0).putInt(0)
      .putInt(1).putInt(if (usPerFrame > 0) 1000000 / usPerFrame else 0) // dwScale, dwRate
      .putInt(0).putInt(frames.size)
    val strf = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
    strf.putInt(40).putInt(16).putInt(16).putShort(1).putShort(24)
      .put("MJPG".getBytes("US-ASCII"))
    val hdrl = list("hdrl", chunk("avih", avih.array()),
      list("strl", chunk("strh", strh.array()), chunk("strf", strf.array())))
    val movi = list("movi", frames.map(chunk("00dc", _)): _*)
    val body = hdrl ++ movi
    val bb = ByteBuffer.allocate(12 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + body.length)
      .put("AVI ".getBytes("US-ASCII")).put(body)
    bb.array()
  }

  test("AVI/MJPEG demuxes and decodes real JPEG frames through the m2 seam") {
    val colors = Seq(0xFF0000, 0x00FF00, 0x0000FF)
    val jpegs = colors.map(jpegBytes)
    val avi = aviMjpeg(jpegs, usPerFrame = 100000) // 10 fps
    val got = Multimodal.AviMjpegFrameDecoder.decode(avi).toSeq

    assert(got.map(_.frame_idx) == Seq(0, 1, 2))
    assert(got.map(_.ts_ms) == Seq(0L, 100L, 200L),
      s"avih cadence must drive timestamps, got ${got.map(_.ts_ms)}")
    // JPEG is lossy, so digests are pinned by round-trip: CRC of each
    // frame's independently decoded raster, same rasterCrc convention
    val expected = jpegs.map { j =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(j))
      refRasterCrc(img)
    }
    assert(got.map(_.frame_crc) == expected,
      "decoded frame digests must match an independent decode of each JPEG")
    assert(got.map(_.frame_crc).distinct.size == 3,
      "distinct source colors must survive as distinct digests")
    // the default 25 fps cadence applies when avih carries no rate
    val noRate = Multimodal.AviMjpegFrameDecoder.decode(aviMjpeg(jpegs, 0)).toSeq
    assert(noRate.map(_.ts_ms) == Seq(0L, 40L, 80L))
    // non-AVI payloads (e.g. the driver corpus's raw video rows) are empty
    assert(Multimodal.AviMjpegFrameDecoder.decode("raw video bytes".getBytes).isEmpty)
    assert(Multimodal.AviMjpegFrameDecoder.decode(Array[Byte]()).isEmpty)
    // malformed chunk sizes must terminate, not loop or throw: 0xFFFFFFFF
    // wraps negative as an Int, and an over-length size overruns the buffer
    val bomb = avi.clone()
    bomb(16) = -1; bomb(17) = -1; bomb(18) = -1; bomb(19) = -1 // hdrl LIST size
    assert(Multimodal.AviMjpegFrameDecoder.decode(bomb).isEmpty,
      "a wrapped-negative chunk size must end the walk cleanly")
    val truncated = java.util.Arrays.copyOf(avi, avi.length / 2)
    Multimodal.AviMjpegFrameDecoder.decode(truncated).toSeq // must not throw
  }

  test("m2 frame sampling runs end-to-end over AVI payloads via the seam") {
    import spark.implicits._
    // 8 frames at 10 fps; every 4th sampled → frames 0 and 4
    val colors = (0 until 8).map(i => (i * 32) << 16 | (255 - i * 32))
    val avi = aviMjpeg(colors.map(jpegBytes), usPerFrame = 100000)
    val blobs = Seq(Multimodal.MediaBlob(1L, "video", avi)).toDS()
    val sampled = Multimodal
      .frameSamplesFrom(blobs, everyNth = 4, Multimodal.AviMjpegFrameDecoder)
      .collect().toSeq
    assert(sampled.map(f => (f.frame_idx, f.ts_ms)) == Seq((0, 0L), (4, 400L)))
    assert(sampled.map(_.frame_crc).distinct.size == 2)
  }

  test("m6 groups byte-identical payloads only: same bytes dedup, same text under different headers don't") {
    // video payload = raw text bytes, so equal-text video docs (ids 2, 5)
    // are byte-identical; audio headers carry the sample rate, which is
    // (id/3)%3-periodic — ids 1 and 10 share text AND rate (dup), id 4
    // shares the text but lands rate 12000 (NOT a dup, despite equal
    // content bytes: the container differs). Image headers fold id%31 and
    // id%17, so equal-text images dedup only at id distance lcm(3,31,17)
    // = 1581 (ids 0 and 1581); id 3 shares the text but not the geometry.
    val dir = writeDocs(Seq(
      (2L, "same clip"), (5L, "same clip"), (8L, "other clip"),
      (1L, "same sound"), (10L, "same sound"), (4L, "same sound"),
      (0L, "same pic"), (1581L, "same pic"), (3L, "same pic")))
    val got = Multimodal.mediaExactDedup(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(3), r.getLong(4)))
    val byType = got.groupBy(_._1).view.mapValues(_.map(g => (g._2, g._3)).toSeq).toMap
    assert(byType("video").sortBy(_._1) == Seq((2L, 2L), (8L, 1L)),
      s"video: ${byType("video").toSeq}")
    assert(byType("audio").sortBy(_._1) == Seq((1L, 2L), (4L, 1L)),
      s"audio: ${byType("audio").toSeq}")
    assert(byType("image").sortBy(_._1) == Seq((0L, 2L), (3L, 1L)),
      s"image: ${byType("image").toSeq}")
    // total mass conserved: every blob is in exactly one group
    assert(got.map(_._3).sum == 9L)
  }

  test("m7 raw scene arithmetic: cut rule, short-frame mass, strict boundary") {
    import spark.implicits._
    // payload A: 128x 0x00 | 128x 0xFF | 128x 0xFF — one total change
    // then a still pair -> scenes {0} and {1,2}
    val a = Array.fill[Byte](128)(0) ++ Array.fill[Byte](128)(-1) ++
      Array.fill[Byte](128)(-1)
    // payload B: 128x 0x00 | 32x 0xFF short tail — L1=160 over mass
    // 128+32=160 -> ratio 1000 per mille, cuts; the SHORT frame's mass
    // must enter the denominator (a fixed-128 denom would read 625)
    val b = Array.fill[Byte](128)(0) ++ Array.fill[Byte](32)(-1)
    // payload C: one short frame -> exactly one single-frame scene
    val c = Array.fill[Byte](40)(7)
    val blobs = Seq(
      Multimodal.MediaBlob(1L, "video", a),
      Multimodal.MediaBlob(2L, "video", b),
      Multimodal.MediaBlob(3L, "video", c)).toDS()
    val got = Multimodal
      .sceneCutsFrom(blobs, thresholdMilli = 250, Multimodal.RawSceneDecoder())
      .collect().map(s => (s.doc_id, s.scene_idx, s.start_frame, s.end_frame,
        s.n_frames, s.start_ms, s.end_ms)).sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      (1L, 0, 0, 0, 1, 0L, 0L),
      (1L, 1, 1, 2, 2, 40L, 80L),
      (2L, 0, 0, 0, 1, 0L, 0L),
      (2L, 1, 1, 1, 1, 40L, 40L),
      (3L, 0, 0, 0, 1, 0L, 0L)), s"got ${got.toSeq}")

    // strict-inequality boundary: frame2 = 64x 0x00 + 64x 0xF0 against
    // frame1 = 128x 0x00 gives L1 = 128, denom = 256 -> exactly 500
    // per mille: NOT a cut at 500 (strict >), a cut at 499
    val e = Array.fill[Byte](128)(0) ++ Array.fill[Byte](64)(0) ++
      Array.fill[Byte](64)(0xF0.toByte)
    def scenesAt(t: Int): Int = Multimodal.sceneCutsFrom(
      Seq(Multimodal.MediaBlob(9L, "video", e)).toDS(), t,
      Multimodal.RawSceneDecoder()).collect().length
    assert(scenesAt(500) == 1, "boundary delta must NOT cut (strict >)")
    assert(scenesAt(499) == 2, "just under the boundary must cut")
  }

  test("m7 detects the shot boundary of a real two-shot animated GIF") {
    import spark.implicits._
    import javax.imageio.{IIOImage, ImageIO}
    // three red frames then three blue: red luma 76 (bin 4), blue luma
    // 29 (bin 1) -> the only large adjacent delta is frame 2 -> 3
    val colors = Seq(0xFF0000, 0xFF0000, 0xFF0000, 0x0000FF, 0x0000FF, 0x0000FF)
    val frames = colors.map { cc =>
      val f = new java.awt.image.BufferedImage(
        16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16) f.setRGB(x, y, cc)
      f
    }
    val baos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(baos)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach(f => writer.writeToSequence(new IIOImage(f, null, null), null))
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    val blobs = Seq(Multimodal.MediaBlob(7L, "video", baos.toByteArray)).toDS()
    val got = Multimodal
      .sceneCutsFrom(blobs, thresholdMilli = 250, Multimodal.ImageIoGifFrameDecoder)
      .collect().map(s => (s.scene_idx, s.start_frame, s.end_frame, s.n_frames,
        s.start_ms, s.end_ms)).sortBy(_._1)
    assert(got.toSeq == Seq(
      (0, 0, 2, 3, 0L, 80L), (1, 3, 5, 3, 120L, 200L)), s"got ${got.toSeq}")
  }

  test("m8 picks the middle keyframe with lowest-bin argmax ties and short-frame mass") {
    import spark.implicits._
    // scenes {0,1} then {2,3,4}: middles are frames 0 and 3
    val a = Array.fill[Byte](256)(0) ++ Array.fill[Byte](384)(-1)
    // tie payload: one frame, bins 0 and 15 both 64 -> dominant = 0
    val tie = Array.fill[Byte](64)(0) ++ Array.fill[Byte](64)(-1)
    // short single frame: mass is the real byte count, not frameBytes
    val short = Array.fill[Byte](40)(0x20)
    val blobs = Seq(
      Multimodal.MediaBlob(1L, "video", a),
      Multimodal.MediaBlob(2L, "video", tie),
      Multimodal.MediaBlob(3L, "video", short)).toDS()
    val got = Multimodal
      .sceneKeyframesFrom(blobs, thresholdMilli = 250, Multimodal.RawSceneDecoder())
      .collect().map(s => (s.doc_id, s.scene_idx, s.keyframe_idx, s.ts_ms,
        s.dominant_bin, s.mass)).sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      (1L, 0, 0, 0L, 0, 128L),
      (1L, 1, 3, 120L, 15, 128L),
      (2L, 0, 0, 0L, 0, 128L),
      (3L, 0, 0, 0L, 2, 40L)), s"got ${got.toSeq}")
  }

  test("m8 keyframes a real two-shot GIF at the shot middles") {
    import spark.implicits._
    import javax.imageio.{IIOImage, ImageIO}
    val colors = Seq(0xFF0000, 0xFF0000, 0xFF0000, 0x0000FF, 0x0000FF, 0x0000FF)
    val frames = colors.map { cc =>
      val f = new java.awt.image.BufferedImage(
        16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16) f.setRGB(x, y, cc)
      f
    }
    val baos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(baos)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach(f => writer.writeToSequence(new IIOImage(f, null, null), null))
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    val blobs = Seq(Multimodal.MediaBlob(7L, "video", baos.toByteArray)).toDS()
    val got = Multimodal
      .sceneKeyframesFrom(blobs, thresholdMilli = 250, Multimodal.ImageIoGifFrameDecoder)
      .collect().map(s => (s.scene_idx, s.keyframe_idx, s.ts_ms,
        s.dominant_bin, s.mass)).sortBy(_._1)
    // red luma 76 -> bin 4; blue luma 29 -> bin 1; 16x16 canvas mass 256
    assert(got.toSeq == Seq(
      (0, 1, 40L, 4, 256L), (1, 4, 160L, 1, 256L)), s"got ${got.toSeq}")
  }

  test("m7 detects the shot boundary of a real AVI/MJPEG despite JPEG loss") {
    import spark.implicits._
    // two red shots then two blue at 10 fps; JPEG wobble on solid
    // primaries stays inside one luma bin, so the histogram delta is
    // still ~total at the boundary and ~zero within shots
    val jpegs = Seq(0xFF0000, 0xFF0000, 0x0000FF, 0x0000FF).map(jpegBytes)
    val avi = aviMjpeg(jpegs, usPerFrame = 100000)
    val blobs = Seq(Multimodal.MediaBlob(8L, "video", avi)).toDS()
    val got = Multimodal
      .sceneCutsFrom(blobs, thresholdMilli = 250, Multimodal.AviMjpegFrameDecoder)
      .collect().map(s => (s.scene_idx, s.start_frame, s.end_frame, s.start_ms,
        s.end_ms)).sortBy(_._1)
    assert(got.toSeq == Seq((0, 0, 1, 0L, 100L), (1, 2, 3, 200L, 300L)),
      s"got ${got.toSeq}")
  }
}
