package graft.plans

import graft.functions.Bpe
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_bpe_encode(text)` under a fitted [[Bpe.Model]] — text → array of
  * subword units. The model rides into generated code as a reference
  * object (the RollingHash pattern at model scale): per row, one JVM
  * greedy-merge loop, no UDF wrapping, no serialization per call. */
case class BpeEncode(child: Expression, model: Bpe.Model) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_bpe_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    BpeEncode.encode(model, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("bpeModel", model, classOf[Bpe.Model].getName)
    defineCodeGen(ctx, ev, c => s"graft.plans.BpeEncode.encode($modelRef, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {
  /** Shared by interpreted eval and generated code. */
  def encode(model: Bpe.Model, text: UTF8String): GenericArrayData =
    toArrayData(model.encodeText(text.toString))

  /** [[BpeEncodeReplay]]'s kernel — the training-order-replay encoder. */
  def encodeReplay(model: Bpe.Model, text: UTF8String): GenericArrayData =
    toArrayData(model.encodeTextReplay(text.toString))

  private def toArrayData(parts: Array[String]): GenericArrayData = {
    val out = new Array[Any](parts.length)
    var i = 0
    while (i < parts.length) { out(i) = UTF8String.fromString(parts(i)); i += 1 }
    new GenericArrayData(out)
  }
}

/** `graft_bpe_encode_replay(text)` — [[Bpe.Model.encodeTextReplay]], the
  * independent reference encoder (merges applied exhaustively in training
  * order instead of the greedy lowest-rank loop). Exists so the t08
  * parity frame can pin the two implementations equal INSIDE the plan —
  * both codegen'd, scan-local, no UDF. */
case class BpeEncodeReplay(child: Expression, model: Bpe.Model) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_bpe_encode_replay"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    BpeEncode.encodeReplay(model, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("bpeModel", model, classOf[Bpe.Model].getName)
    defineCodeGen(ctx, ev, c => s"graft.plans.BpeEncode.encodeReplay($modelRef, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeReplay =
    copy(child = newChild)
}
