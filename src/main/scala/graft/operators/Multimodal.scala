package graft.operators

import java.util.zip.CRC32

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: media payloads travel as opaque `binary`
  * columns with typed metadata alongside; decode / feature-extraction runs
  * per-partition in batches (the Scala analog of a vectorized `mapInPandas`
  * decode stage).
  *
  * The actual codec is STUBBED — this container has no image/audio
  * libraries — behind `decodeStub`, which produces a deterministic fake
  * header parse. Everything Spark-cares-about is real and load-bearing:
  * the binary column, the typed batch boundary (`Dataset[MediaBlob]` →
  * `mapPartitions` → `Dataset[MediaMeta]`), the encoder schemas, and the
  * partition-parallel shape a real decoder would drop into unchanged.
  */
object Multimodal {

  /** An opaque media payload: what a real pipeline reads from a blob store
    * column.
    */
  case class MediaBlob(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Extracted metadata; `width`/`height`/`n_frames` come from the stubbed
    * header parse.
    */
  case class MediaMeta(doc_id: Long, media_type: String, byte_len: Long,
                       crc32: Long, width: Int, height: Int, n_frames: Int)

  /** STUB: a real implementation parses the codec header (JPEG SOF, WAV
    * fmt, MP4 moov...). This fake derives deterministic dimensions from the
    * payload bytes so the pipeline shape is testable without codecs.
    */
  private def decodeStub(b: MediaBlob): MediaMeta = {
    val crc = new CRC32()
    crc.update(b.payload)
    val c = crc.getValue
    MediaMeta(
      doc_id = b.doc_id,
      media_type = b.media_type,
      byte_len = b.payload.length.toLong,
      crc32 = c,
      width = (c % 1920L).toInt + 1,
      height = ((c >> 16) % 1080L).toInt + 1,
      n_frames = (b.payload.length / 1024) + 1)
  }

  /** One sampled frame of a (stubbed) video decode. */
  case class FrameSample(doc_id: Long, frame_idx: Int, ts_ms: Long, frame_crc: Long)

  /** m2: frame sampling — the one-to-many decode fan-out (video row →
    * sampled frame rows) via a typed flatMap-style mapPartitions. The frame
    * "decode" is the same deterministic stub; the fan-out shape, encoder
    * schemas, and per-partition batching are what a real ffmpeg stage
    * drops into.
    */
  def frameSamples(spark: SparkSession, dir: String,
                   everyNth: Int = 4): Dataset[FrameSample] = {
    import spark.implicits._
    val blobs = mediaBlobs(spark, dir).filter(_.media_type == "video")
    blobs.mapPartitions(_.flatMap { b =>
      val meta = decodeStub(b)
      (0 until meta.n_frames by everyNth).map { i =>
        val crc = new CRC32()
        crc.update(b.payload, (i * 64) % math.max(1, b.payload.length),
          math.min(64, b.payload.length))
        FrameSample(b.doc_id, i, i * 40L, crc.getValue) // 25 fps -> 40ms/frame
      }
    })
  }

  /** One overlapping chunk of a (stubbed) audio decode. */
  case class AudioChunk(doc_id: Long, chunk_idx: Int, start_byte: Long,
                        n_bytes: Int, chunk_crc: Long)

  /** m3: overlapping-window chunking — the ASR-style fixed-window-with-
    * stride fan-out (e.g. 30 s windows, 24 s stride, so chunk boundaries
    * never cut a word that a neighbor doesn't cover whole). Distinct from
    * m2's strided *sampling*: every chunk here is a contiguous slice and
    * consecutive chunks overlap by `chunk - stride` bytes. The slice
    * arithmetic runs on the opaque payload (a real stage would resample
    * PCM first); the fan-out, typed encoder schema, and per-partition
    * batching are the load-bearing Spark parts. The final partial window
    * is kept iff it starts before the payload ends.
    */
  def audioChunks(spark: SparkSession, dir: String,
                  chunkBytes: Int = 256, strideBytes: Int = 192): Dataset[AudioChunk] = {
    require(strideBytes > 0 && chunkBytes >= strideBytes,
      "need 0 < stride <= chunk for full coverage")
    import spark.implicits._
    mediaBlobs(spark, dir).filter(_.media_type == "audio")
      .mapPartitions(_.flatMap { b =>
        val len = b.payload.length
        val starts = 0 until math.max(1, len) by strideBytes
        starts.zipWithIndex.map { case (s, i) =>
          val n = math.min(chunkBytes, len - s)
          val crc = new CRC32()
          crc.update(b.payload, s, n)
          AudioChunk(b.doc_id, i, s.toLong, n, crc.getValue)
        }
      })
  }

  /** The synthesized media column: documents' text bytes standing in for a
    * blob-store payload, modality assigned deterministically by id.
    */
  private def mediaBlobs(spark: SparkSession, dir: String): Dataset[MediaBlob] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        element_at(
          array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
        col("text").cast("binary").as("payload"))
      .as[MediaBlob]
  }

  /** m1: metadata extraction over a synthesized media column (documents'
    * text bytes standing in for a blob). One narrow `mapPartitions` pass —
    * no shuffle, no driver involvement, decode parallelism = partition
    * count.
    */
  def mediaMetadata(spark: SparkSession, dir: String): DataFrame =
    mediaBlobs(spark, dir)
      .mapPartitions(_.map(decodeStub))(
        org.apache.spark.sql.Encoders.product[MediaMeta])
      .toDF()
      .orderBy("doc_id")
}
