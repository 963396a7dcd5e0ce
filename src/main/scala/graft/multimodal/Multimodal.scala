package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: opaque binary payloads + typed metadata.
  *
  * The engine's convention for image/audio/video at 100 TB: payloads travel
  * as a `binary` column (parquet keeps them out of dictionary/stats paths),
  * metadata as a typed struct alongside, and decode/feature-extraction runs
  * partition-local over iterator batches (`mapPartitions`) so a native
  * decoder is amortized per-partition, never per-row — the Spark-side
  * plumbing (schema, batching, partitioning) is real; the decoder itself is
  * a deterministic stub here because no image/audio libs ship in this
  * container (see `decodeStub`).
  */
object Multimodal {

  /** Typed row for the decoded-feature output. */
  final case class MediaFeatures(
      doc_id: Long, format: String, n_bytes: Int, first_byte: Int, checksum: Long)

  /** Wrap a text corpus as a multimodal table: payload = utf-8 bytes,
    * metadata struct carried alongside. (With real media, payload comes off
    * `spark.read.format("binaryFile")` with the same shape.) */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("text/plain").as("format"),
        col("source").as("origin"),
        col("n_chars").as("content_length")).as("meta"))

  /** STUB decoder — stands in for an image/audio decode (libs absent in this
    * container). Deterministic over the payload bytes so results are
    * verifiable; a real decoder would replace the body, keeping the
    * signature. */
  private def decodeStub(payload: Array[Byte]): (Int, Long) = {
    var checksum = 0L
    var i = 0
    while (i < payload.length) { checksum = checksum * 31 + (payload(i) & 0xff); i += 1 }
    (if (payload.isEmpty) -1 else payload(0) & 0xff, checksum)
  }

  /** Typed row for resized ("thumbnail") payloads. */
  final case class ResizedMedia(
      doc_id: Long, format: String, width: Int, height: Int, thumb: Array[Byte])

  /** Typed row for sampled frames. */
  final case class FrameSample(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Resize stub — stands in for an image resize (decode → scale → re-encode
    * with a real codec). The stub strides the payload down to width×height
    * bytes, deterministically; the Spark-side shape (typed output schema,
    * partition-local batching) is what a real resizer plugs into. */
  def resize(spark: SparkSession, media: DataFrame,
             width: Int = 4, height: Int = 4): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"), col("meta.format").as("format"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        val target = width * height
        rows.map { case (id, payload, format) =>
          val thumb =
            if (payload.length <= target) payload
            else Array.tabulate(target)(i => payload((i.toLong * payload.length / target).toInt))
          ResizedMedia(id, format, width, height, thumb)
        }
      }
  }

  /** Frame-sample stub — stands in for video frame extraction: treat the
    * payload as fixed-size frames and keep every `everyN`-th one. One output
    * row per kept frame (explode shape), so downstream per-frame featurizers
    * parallelize over frames, not videos. */
  def frameSample(spark: SparkSession, media: DataFrame,
                  frameBytes: Int = 256, everyN: Int = 4): Dataset[FrameSample] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          val nFrames = math.max(1, payload.length / frameBytes)
          (0 until nFrames by everyN).iterator.map { f =>
            FrameSample(id, f, payload.slice(f * frameBytes,
              math.min((f + 1) * frameBytes, payload.length)))
          }
        }
      }
  }

  /** m01: partition-local feature extraction over the binary payload.
    * One decoder instantiation per partition (the expensive part with real
    * codecs), iterator-to-iterator so spill/codegen pipelining is preserved. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"), col("meta.format").as("format"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        // per-partition decoder setup would go here
        rows.map { case (id, payload, format) =>
          val (first, sum) = decodeStub(payload)
          MediaFeatures(id, format, payload.length, first, sum)
        }
      }
  }
}
