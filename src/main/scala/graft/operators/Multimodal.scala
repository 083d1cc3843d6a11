package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for 100 TB training-data
  * pipelines.
  *
  * Media is carried as an opaque `binary` column plus a typed metadata
  * struct; decode / feature-extraction / resize / frame-sampling run as
  * batched partition-level functions (`mapPartitions` over typed rows — the
  * JVM analog of `mapInPandas`: one batch in executor memory at a time, no
  * per-row call overhead, schema declared up front).
  *
  * The actual codec kernels (JPEG decode, audio resample, video frame
  * extraction) require native media libraries that are NOT in this
  * container, so the kernel bodies are STUBS: `decodeStub` derives a
  * deterministic fake feature vector from the bytes. The Spark-side
  * contract — schema, batching, partitioning, null/error handling — is real
  * and tested; swapping the stub for a real codec changes only the kernel
  * body.
  */
object Multimodal {

  final case class MediaMeta(format: String, width: Int, height: Int,
      n_frames: Int)
  final case class MediaRow(media_id: Long, content: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, format: String,
      n_bytes: Int, features: Array[Float])
  final case class FrameRow(media_id: Long, frame_idx: Int,
      frame_bytes: Array[Byte])

  /** STUB decode kernel: a real implementation would decode the media bytes
    * (e.g. JPEG -> pixel tensor) and run a feature extractor. Deterministic
    * fake: a 16-bin byte-value histogram, L1-normalized. Marked for
    * replacement; see class scaladoc.
    */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) >>> 4) += 1f
      i += 1
    }
    val total = math.max(bytes.length, 1).toFloat
    hist.map(_ / total)
  }

  /** Batched feature extraction over a media table: binary in, fixed-width
    * feature vector out. One partition = one batch (mapInPandas shape).
    */
  def extractFeatures(media: Dataset[MediaRow])(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { batch =>
      batch.map { m =>
        MediaFeatures(m.media_id, m.meta.format, m.content.length,
          decodeStub(m.content))
      }
    }
  }

  /** STUB frame sampler: treats the payload as `n_frames` equal chunks and
    * emits every `stride`-th chunk (a real implementation would seek video
    * keyframes). Output rows are (media_id, frame_idx, frame_bytes).
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int)(
      implicit spark: SparkSession): Dataset[FrameRow] = {
    import spark.implicits._
    media.mapPartitions { batch =>
      batch.flatMap { m =>
        val n = math.max(m.meta.n_frames, 1)
        val len = m.content.length
        val frameLen = math.max(len / n, 1)
        (0 until n by stride).iterator.map { f =>
          // clamp both ends: when n_frames exceeds the byte budget the tail
          // frames are empty, not out-of-bounds
          val from = math.min(f * frameLen, len)
          val until = math.min(from + frameLen, len)
          FrameRow(m.media_id, f,
            java.util.Arrays.copyOfRange(m.content, from, until))
        }
      }
    }
  }

  /** STUB resize: a real implementation would rescale pixels; the stub
    * truncates/pads the payload to the target byte budget and rewrites the
    * metadata, preserving the schema contract.
    */
  def resize(media: Dataset[MediaRow], targetW: Int, targetH: Int)(
      implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    media.mapPartitions { batch =>
      batch.map { m =>
        val budget = math.max(targetW * targetH / 64, 1)
        val resized = java.util.Arrays.copyOf(m.content,
          math.min(budget, math.max(m.content.length, 1)))
        MediaRow(m.media_id, resized,
          MediaMeta(m.meta.format, targetW, targetH, m.meta.n_frames))
      }
    }
  }

  /** Synthesize a deterministic media table from the `documents` fixture
    * (text bytes stand in for media payloads) — exercises the binary-column
    * plumbing without real codecs.
    */
  def syntheticMediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val fmt = if (id % 3 == 0) "jpeg" else if (id % 3 == 1) "wav" else "mp4"
        MediaRow(id, bytes, MediaMeta(fmt, 64, 64, math.max((nChars / 100).toInt, 1)))
      }
  }
}
