package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video travel as opaque `binary`
 * payloads with typed metadata, processed by per-partition decoders.
 *
 * The Spark side — schemas, encoders, partition-batched processing, the
 * explode shape for frame sampling — is real and tested. The actual media
 * decoding is STUBBED with deterministic fakes (this environment has no
 * image/audio codecs); each stub is a single clearly-marked function to
 * swap for a real decoder (e.g. javax.imageio / ffmpeg bindings) without
 * touching the pipeline.
 *
 * Scale notes: decode work is a pure `mapPartitions` — no shuffle, linear
 * scan, parallelism = input partitions. Payloads stay off the driver. For
 * 100 TB of media, `spark.sql.files.maxPartitionBytes` sizes the per-task
 * batch; decoded metadata is orders of magnitude smaller than payloads, so
 * the only large I/O is the initial columnar scan (and parquet stores the
 * binary column contiguously, so metadata-only readers that drop `payload`
 * never touch the bytes).
 */
object Multimodal {

  /** A media object at rest: opaque payload + routing metadata. */
  case class MediaFile(media_id: Long, modality: String, payload: Array[Byte])

  case class MediaMeta(
      media_id: Long,
      modality: String,
      byte_len: Long,
      width: Long,      // image/video: fake-decoded dimensions
      height: Long,
      n_frames: Long)   // video: fake-decoded frame count; 1 otherwise

  case class Frame(media_id: Long, frame_idx: Long, frame_offset: Long)

  // ------------------------------------------------------------------
  // STUB DECODERS — deterministic fakes standing in for real codecs.
  // Swap these bodies for javax.imageio / jcodec / ffmpeg calls; the
  // Spark pipeline around them is production-shaped.
  // ------------------------------------------------------------------

  /** STUB: "decode" image dimensions from payload bytes (deterministic
    * arithmetic on byte length, stands in for a header parse). */
  private[pipeline] def stubDecodeDims(payload: Array[Byte]): (Long, Long) = {
    val len = payload.length.toLong
    (1L + len % 640L, 1L + len % 480L)
  }

  /** STUB: "decode" a video's frame count (deterministic; one frame per
    * KiB of payload, capped at 8). */
  private[pipeline] def stubFrameCount(payload: Array[Byte]): Long =
    math.min(8L, 1L + payload.length.toLong / 1024L)

  // ------------------------------------------------------------------
  // Pipeline operators (real)
  // ------------------------------------------------------------------

  /** Decode typed metadata for every media row. Per-partition batch map —
    * no shuffle; the decoder is invoked once per row with the raw bytes. */
  def decodeMeta(media: Dataset[MediaFile]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val (w, h) = stubDecodeDims(m.payload)
        val frames = if (m.modality == "video") stubFrameCount(m.payload) else 1L
        MediaMeta(m.media_id, m.modality, m.payload.length.toLong, w, h, frames)
      }
    }
  }

  /** Sample every frame descriptor of video rows (explode shape: one output
    * row per frame, offsets point into the payload). */
  def sampleFrames(media: Dataset[MediaFile]): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.modality == "video").flatMap { m =>
      val n = stubFrameCount(m.payload)
      val stride = if (n > 0) m.payload.length.toLong / n else 0L
      (0L until n).map(i => Frame(m.media_id, i, i * stride))
    }
  }

  /** Lift the documents table into a fake media table (payload = UTF-8
    * bytes of the text, modality round-robins image/audio/video) — the
    * deterministic fixture used by tests and the driver queries. */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaFile] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[MediaFile]
  }
}
