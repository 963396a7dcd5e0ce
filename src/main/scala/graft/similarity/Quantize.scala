package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric int8 scalar quantization of the embedding column — the
  * standard memory lever for ANN at scale: 8 bytes/dim (double) → 1 byte
  * (tinyint), an 8× smaller corpus footprint, at a bounded per-element
  * error of scale/2 = max|x|/254.
  *
  * Both directions are pure Column expression trees (whole-stage codegen,
  * zero shuffle, scan-speed at 100 TB) and engine-portable: rounding is
  * floor(x/scale + 0.5) because IEEE floor is bit-identical everywhere,
  * while round()'s half-way rule differs by engine — so the s03 oracle can
  * hash-match the quantized bytes exactly.
  *
  * Composition: quantize at ingest, store qvec+scale; serve kNN over
  * [[dequantized]] vectors (QuantizeSpec pins the recall cost vs exact) or
  * feed them to the IVF path — the centroids see dequantized values, so
  * Knn.ivfServe works unchanged. The composed search is registered as
  * `s04_knn_quantized` and — because quantization is deterministic, unlike
  * IVF's trained cells — is fully hash-checked against a DuckDB oracle
  * that dequantizes the same way.
  */
object Quantize {

  private def quantCols(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"), col("v"),
        // symmetric range: max|x| maps to ±127; the 1e-30 floor keeps a
        // zero vector from dividing by zero (its qvec is all zeros)
        (greatest(array_max(transform(col("v"), x => abs(x))), lit(1e-30))
          / lit(127.0)).as("scale"))

  /** s03: (vec_id, scale, qvec: array<tinyint>). */
  def quantized(emb: DataFrame): DataFrame =
    quantCols(emb).select(col("vec_id"), col("scale"),
      transform(col("v"),
        x => floor(x / col("scale") + lit(0.5)).cast("tinyint")).as("qvec"))

  /** Reconstructed vectors (vec_id, embedding: array<double>) — the lossy
    * round-trip the serving path scores against. */
  def dequantized(emb: DataFrame): DataFrame =
    quantized(emb).select(col("vec_id"),
      transform(col("qvec"), q => q.cast("double") * col("scale")).as("embedding"))
}
