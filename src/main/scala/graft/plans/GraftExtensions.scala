package graft.plans

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function

/** Engine extension point (SURVEY.md §4 "custom Catalyst work").
  *
  * Registers the engine's native expressions with the session so they are
  * callable from SQL as well as the Column API. Install either via
  * `spark.sql.extensions=graft.plans.GraftExtensions` or by calling
  * `GraftExtensions.register(spark)` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectFunction(GraftExtensions.rollingHashDescriptor)
}

object GraftExtensions {

  private[plans] val rollingHashDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_rolling_hash"),
    new ExpressionInfo(classOf[RollingHash].getName, "graft_rolling_hash"),
    (args: Seq[Expression]) => RollingHash(args.head))

  /** Column-API surface (requires `register(spark)` or the extensions conf;
    * resolves through the registry so no private Column internals are
    * touched). */
  def rolling_hash(c: Column): Column = call_function("graft_rolling_hash", c)

  /** Register on an already-built session (tests, REPL). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_rolling_hash", args => RollingHash(args.head), "built-in")
}
