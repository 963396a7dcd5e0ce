package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector column functions over `array<float|double>` embedding columns.
  *
  * Expression trees only (zip_with / aggregate are codegen'd higher-order
  * functions) — accumulation is sequential left-to-right, matching DuckDB's
  * list_* kernels for oracle parity.
  */
object VectorFns {

  /** Σ aᵢ·bᵢ with a double accumulator. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Σ aᵢ² (squared L2 norm). */
  def normSq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x * x)

  def l2Norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity, dot/(√‖a‖²·√‖b‖²) — the same association DuckDB's
    * list_cosine_similarity uses. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** Squared euclidean distance. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

  /** Squared euclidean distance to a driver-side constant vector (a model
    * artifact such as a KMeans center), embedded as an array literal. */
  def l2SqLit(a: Column, c: Array[Double]): Column =
    l2Sq(a, array(c.map(lit(_)): _*))
}
