package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge.
  *
  * Spark 4 made the Column↔Expression adapters `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`), but a library that
  * registers *composed* Column functions in the FunctionRegistry needs
  * exactly this conversion: the registry hands us `Seq[Expression]` and we
  * return the expression under a reused Column tree. The conventional
  * ecosystem escape hatch is this — a minimal shim compiled into the
  * `org.apache.spark.sql` namespace; it touches no other internals.
  */
object ColumnBridge {
  /** Eagerly converts the whole column-node tree. `ExpressionUtils
    * .expression` instead defers behind a `ColumnNodeExpression` wrapper
    * that only the analyzer's own conversion pass unwraps — an expression a
    * FunctionRegistry builder returns *mid-analysis* would keep the
    * unevaluable wrapper all the way to codegen. The LazyExpression strip
    * covers the markers the converter inserts around function invocations
    * (their EliminateLazyExpression batch has already run for this tree). */
  def toExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node).transform {
      case l: org.apache.spark.sql.catalyst.analysis.LazyExpression => l.child
    }
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
}
