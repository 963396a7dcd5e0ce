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
