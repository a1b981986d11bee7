package graft

import org.apache.spark.sql.SaveMode

import graft.operators.Multimodal

/** Multimodal plumbing semantics on crafted payloads: chunk/stride coverage
  * arithmetic (m3), frame fan-out counts (m2), and metadata determinism
  * (m1). The decode itself is a documented stub; these pin the Spark-side
  * shape that a real codec drops into.
  */
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

  test("m1 metadata is deterministic and typed") {
    val dir = writeDocs(Seq((1L, "hello"), (2L, "hello"), (3L, "hello")))
    val rows = Multimodal.mediaMetadata(spark, dir).collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("audio", "video", "image"))
    // same payload -> same crc regardless of modality
    assert(rows.map(_.getLong(3)).distinct.length == 1)
    assert(rows.map(_.getLong(2)).toSeq == Seq(5L, 5L, 5L))
  }
}
