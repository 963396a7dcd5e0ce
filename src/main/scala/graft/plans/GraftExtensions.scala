package graft.plans

import graft.functions.{TextFns, VectorFns}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.graft.ColumnBridge

/** Engine extension point (SURVEY.md §4 "custom Catalyst work").
  *
  * Registers the engine's native and composed expressions with the session
  * so they are callable from SQL as well as the Column API — a user of the
  * reference who lives in SQL gets the whole function surface without
  * touching Scala. Install either via
  * `spark.sql.extensions=graft.plans.GraftExtensions` or by calling
  * `GraftExtensions.register(spark)` on a live session.
  *
  * The composed functions (text/vector) reuse the exact Column trees from
  * [[graft.functions.TextFns]]/[[graft.functions.VectorFns]] — SQL and
  * Column API cannot drift apart because they are the same expression.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(e.injectFunction)
}

object GraftExtensions {

  private def expr(c: Column): Expression = ColumnBridge.toExpression(c)
  private def col(e: Expression): Column = ColumnBridge.toColumn(e)

  /** (name, arity, builder) for every SQL-exposed engine function. */
  private[plans] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_rolling_hash" -> (args => RollingHash(args.head)),
    "graft_tokens" -> (args => expr(TextFns.tokens(col(args.head)))),
    "graft_token_count" -> (args => expr(TextFns.tokenCount(col(args.head)))),
    "graft_bpeish_count" -> (args => expr(TextFns.bpeishCount(col(args.head)))),
    "graft_shingles" -> (args => expr(TextFns.shingles(col(args.head)))),
    "graft_lang_guess" -> (args => expr(TextFns.langGuess(col(args.head)))),
    "graft_quality" -> (args => expr(TextFns.qualityScore(col(args.head)))),
    "graft_fingerprint" -> (args => expr(TextFns.fingerprint(col(args.head)))),
    "graft_dot" -> (args => expr(VectorFns.dot(col(args(0)), col(args(1))))),
    "graft_cosine" -> (args => expr(VectorFns.cosine(col(args(0)), col(args(1))))),
    "graft_l2sq" -> (args => expr(VectorFns.l2Sq(col(args(0)), col(args(1))))),
  )

  private[plans] val descriptors
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    builders.map { case (name, b) =>
      (FunctionIdentifier(name), new ExpressionInfo(classOf[RollingHash].getName, name), b)
    }

  /** Column-API surface (requires `register(spark)` or the extensions conf;
    * resolves through the registry so no private Column internals are
    * touched). */
  def rolling_hash(c: Column): Column = call_function("graft_rolling_hash", c)

  /** Register on an already-built session (tests, REPL). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, b, "built-in")
    }
}
