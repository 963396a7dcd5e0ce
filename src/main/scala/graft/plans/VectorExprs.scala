package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native vector kernels over `array<double>` embedding columns, as
  * whole-stage-codegen Catalyst expressions.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) express these
  * folds declaratively but evaluate them interpreted — per-element lambda
  * dispatch plus an intermediate array allocation for the zip — which is the
  * dominant cost of the scoring loop in kNN (s01/s02/s04), where one dot
  * product runs per (corpus row × query). These expressions keep the exact
  * fold semantics of the HOF trees (left-to-right double accumulation; any
  * null element or a length mismatch yields null, as zip_with's null padding
  * does) while compiling to a tight primitive loop inside the generated
  * stage. The HOF forms remain in [[graft.functions.VectorFns]] as the
  * semantic reference; a property spec pins bit-for-bit equivalence.
  *
  * SURVEY.md §2.3 "UDF surface" / §4: custom `Expression` only where the
  * built-in operators genuinely can't deliver the performance.
  */
object VectorKernels {

  /** Analysis-time guard: every child must be array<double>. The Column
    * wrappers cast for callers; this catches direct misuse with a clear
    * message instead of a runtime ClassCastException. */
  private[plans] def checkDoubleArrays(name: String, children: Seq[Expression]): TypeCheckResult =
    children.find(c => !c.dataType.isInstanceOf[ArrayType] ||
        c.dataType.asInstanceOf[ArrayType].elementType != DoubleType) match {
      case Some(bad) => TypeCheckResult.TypeCheckFailure(
        s"$name expects array<double> arguments, got ${bad.dataType.catalogString}")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  /** Σ aᵢ·bᵢ; null if lengths differ or any visited element is null. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** Σ aᵢ²; null if any element is null. */
  def normSq(a: ArrayData): java.lang.Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = a.getDouble(i)
      acc += x * x
      i += 1
    }
    acc
  }

  /** a / ‖a‖ (zero vector: returned as-is); null if any element is null. */
  def l2Normalize(a: ArrayData): ArrayData = {
    val nsq = normSq(a)
    if (nsq == null) return null
    val n = a.numElements()
    val out = new Array[Any](n)
    val norm = math.sqrt(nsq.doubleValue())
    var i = 0
    while (i < n) {
      out(i) = if (norm > 0) a.getDouble(i) / norm else a.getDouble(i)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Σ (aᵢ−bᵢ)²; null if lengths differ or any visited element is null. */
  def l2Sq(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }
}

/** Shared shape for the two-vector kernels: array<double> inputs (the
  * [[graft.functions.VectorFns]] wrappers insert the cast, so float arrays
  * coerce there and an identity cast simplifies away), double output,
  * nullable because a non-null pair can still fold to null (length
  * mismatch / null element). */
abstract class VecBinaryKernel extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    VectorKernels.checkDoubleArrays(prettyName, children)

  /** Fully-qualified static kernel, e.g. `graft.plans.VectorKernels.dot`. */
  protected def kernel: String

  protected def evalKernel(a: ArrayData, b: ArrayData): java.lang.Double

  override protected def nullSafeEval(a: Any, b: Any): Any =
    evalKernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("vecKernel")
      s"""
         |java.lang.Double $r = $kernel($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })
}

/** `graft_dot(a, b)` — Σ aᵢ·bᵢ. */
case class VecDot(left: Expression, right: Expression) extends VecBinaryKernel {
  override def prettyName: String = "graft_dot"
  override protected def kernel: String = "graft.plans.VectorKernels.dot"
  override protected def evalKernel(a: ArrayData, b: ArrayData): java.lang.Double =
    VectorKernels.dot(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

/** `graft_l2sq(a, b)` — Σ (aᵢ−bᵢ)². */
case class VecL2Sq(left: Expression, right: Expression) extends VecBinaryKernel {
  override def prettyName: String = "graft_l2sq"
  override protected def kernel: String = "graft.plans.VectorKernels.l2Sq"
  override protected def evalKernel(a: ArrayData, b: ArrayData): java.lang.Double =
    VectorKernels.l2Sq(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecL2Sq =
    copy(left = l, right = r)
}

/** `graft_l2_normalize(a)` — a / ‖a‖; zero vectors pass through. */
case class VecL2Normalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_l2_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    VectorKernels.checkDoubleArrays(prettyName, Seq(child))

  override protected def nullSafeEval(a: Any): Any =
    VectorKernels.l2Normalize(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("vecKernel")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.plans.VectorKernels.l2Normalize($a);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecL2Normalize =
    copy(child = newChild)
}

/** `graft_norm_sq(a)` — Σ aᵢ². */
case class VecNormSq(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_norm_sq"

  override def checkInputDataTypes(): TypeCheckResult =
    VectorKernels.checkDoubleArrays(prettyName, Seq(child))

  override protected def nullSafeEval(a: Any): Any =
    VectorKernels.normSq(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("vecKernel")
      s"""
         |java.lang.Double $r = graft.plans.VectorKernels.normSq($a);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecNormSq =
    copy(child = newChild)
}
