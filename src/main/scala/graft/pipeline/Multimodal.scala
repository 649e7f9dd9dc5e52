package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Multimodal-column plumbing (SURVEY §2.4 #52): media travels as an
  * opaque `binary` column with typed metadata; decode / frame-sample /
  * feature-extract runs per partition over a typed Dataset — the
  * executor-side batch pattern you'd use with a real codec (one
  * decoder instance per partition, streaming rows through it), minus
  * the codec itself: no image/audio libraries ship in this container,
  * so `StubDecoder` is a clearly-marked deterministic fake. The
  * Spark-side shape — schema, encoders, partition lifecycle, feature
  * output — is real and oracle-checked.
  */
object Multimodal {

  /** the wire schema: one media object per row */
  final case class MediaRow(doc_id: Long, media: Array[Byte],
                            media_type: String)

  /** extracted features (deterministic fake values, real schema) */
  final case class MediaFeatures(doc_id: Long, n_bytes: Long,
                                 n_frames: Long, width: Int, height: Int,
                                 checksum: Long)

  val FrameBytes = 256

  /** STUB: stands in for an image/video decoder. Deterministic fake:
    * "frames" are 256-byte chunks, "dimensions" derive from the byte
    * length, "checksum" sums the first 64 unsigned bytes (a stand-in
    * for a decoded-content digest). A real deployment swaps only this
    * class; the Dataset plumbing around it is unchanged. */
  final class StubDecoder {
    def decode(media: Array[Byte]): (Long, Int, Int, Long) = {
      val n = media.length.toLong
      val frames = (n + FrameBytes - 1) / FrameBytes
      val width = (64 + n % 640).toInt
      val height = (64 + (n * 7) % 480).toInt
      val checksum =
        media.take(64).foldLeft(0L)((acc, b) => acc + (b & 0xff))
      (frames, width, height, checksum)
    }

    /** unsigned-byte sum over one frame's slice (the per-frame
      * stand-in for a decoded-frame digest) */
    def frameChecksum(media: Array[Byte], off: Int, len: Int): Long = {
      var acc = 0L
      var i = off
      val end = off + len
      while (i < end) { acc += (media(i) & 0xff); i += 1 }
      acc
    }
  }

  /** per-partition feature extraction: decoder opened once per
    * partition (codec init is expensive in the real case), rows
    * streamed through — never materialized per partition */
  def extractFeatures(media: Dataset[MediaRow])
                     (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      val decoder = new StubDecoder
      it.map { r =>
        val (frames, w, h, sum) = decoder.decode(r.media)
        MediaFeatures(r.doc_id, r.media.length.toLong, frames, w, h, sum)
      }
    }
  }

  /** one row per SAMPLED frame (the doc → rows explosion a video
    * pipeline feeds to per-frame featurizers) */
  final case class FrameRow(doc_id: Long, frame_idx: Long, frame_off: Long,
                            frame_len: Long, checksum: Long)

  val MaxSampledFrames = 4L

  /** Frame sampling: decode each media object's frame sequence and
    * keep an evenly-strided sample of at most `MaxSampledFrames`
    * frames. Output is ROWS, so downstream per-frame work (embedding,
    * OCR, filtering) parallelizes past the per-document boundary —
    * a long video stops pinning one task. Same per-partition decoder
    * lifecycle as `extractFeatures`; the stub "frame" is a 256-byte
    * chunk and its checksum an unsigned-byte sum (a real deployment
    * swaps StubDecoder only). */
  def sampleFrames(media: Dataset[MediaRow])
                  (implicit spark: SparkSession): Dataset[FrameRow] = {
    import spark.implicits._
    media.mapPartitions { it =>
      val decoder = new StubDecoder
      it.flatMap { r =>
        val n = r.media.length.toLong
        val frames = (n + FrameBytes - 1) / FrameBytes
        val stride =
          math.max(1L, (frames + MaxSampledFrames - 1) / MaxSampledFrames)
        (0L until frames by stride).iterator.map { idx =>
          val off = idx * FrameBytes
          val len = math.min(FrameBytes.toLong, n - off)
          FrameRow(r.doc_id, idx, off, len,
            decoder.frameChecksum(r.media, off.toInt, len.toInt))
        }
      }
    }
  }

  /** documents.text as a stand-in media payload (UTF-8 bytes) */
  def asMedia(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast(BinaryType).as("media"),
        lit("text/plain").as("media_type"))
      .as[MediaRow]
  }
}
