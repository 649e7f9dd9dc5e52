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

  /** documents.text as a stand-in media payload (UTF-8 bytes) */
  def asMedia(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast(BinaryType).as("media"),
        lit("text/plain").as("media_type"))
      .as[MediaRow]
  }
}
