package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Rabin–Karp-style rolling polynomial hash over a string's UTF-8 bytes,
  * as a native Catalyst expression with whole-stage codegen.
  *
  * This is the engine's document-fingerprinting primitive (SURVEY.md §2.3
  * "UDF surface": custom `Expression` where perf demands). A Scala UDF doing
  * the same work breaks codegen and pays serialization per row; this stays
  * inside the generated loop — the per-row cost is the byte scan itself.
  *
  * h₀ = 0;  hᵢ₊₁ = hᵢ·B + byteᵢ  (wrapping 64-bit arithmetic, B = 1000003)
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.RollingHash.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  final val Base = 1000003L

  /** Called from both interpreted eval and generated code. */
  def hash(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * Base + (bytes(i) & 0xff); i += 1 }
    h
  }
}
