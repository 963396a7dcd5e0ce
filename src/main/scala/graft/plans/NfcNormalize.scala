package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression.
  *
  * Web-scraped corpora mix composed and decomposed encodings of the SAME
  * visible text ("é" as U+00E9 vs "e"+U+0301): byte-keyed dedup (d01/t04)
  * is blind to the duplication and tokenizers split the variants into
  * different vocab entries, so canonicalizing to NFC belongs at the front
  * of a text pipeline (d16 composes it with d01's exact dedup). Spark SQL
  * has no normalization builtin; a Scala UDF would break whole-stage
  * codegen on the hottest scan in the pipeline — hence a native
  * `Expression` (the RollingHash precedent, SURVEY.md §2.3 "UDF surface").
  *
  * The common case is already-NFC (all-ASCII) text: `isNormalized` is a
  * cheap scan that skips the allocation entirely, so the per-row cost on
  * clean data is one pass over the chars.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Called from both interpreted eval and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column-API surface (no registry needed — direct expression wrap). */
  def nfcCol(c: Column): Column =
    ColumnBridge.toColumn(NfcNormalize(ColumnBridge.toExpression(c)))
}
