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
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.descriptors.foreach(e.injectFunction)
    e.injectOptimizerRule(_ => PushCostlyProjectionThroughJoin)
    e.injectOptimizerRule(_ => RewriteLowCardWindow)
    e.injectOptimizerRule(_ => ApplyZoneMapIndex)
    e.injectOptimizerRule(_ => MaintainZoneManifestOnWrite)
    e.injectPlannerStrategy(_ => TopKStrategy)
  }
}

object GraftExtensions {

  private def expr(c: Column): Expression = ColumnBridge.toExpression(c)
  private def col(e: Expression): Column = ColumnBridge.toColumn(e)

  /** (name, arity, builder) for every SQL-exposed engine function; the
    * arity check turns a wrong-argument-count call into a clear
    * AnalysisException instead of a builder IndexOutOfBounds. */
  private[plans] val builders: Seq[(String, Int, Seq[Expression] => Expression)] = Seq(
    ("graft_rolling_hash", 1, (args: Seq[Expression]) => RollingHash(args.head)),
    ("graft_nfc", 1, (args: Seq[Expression]) => NfcNormalize(args.head)),
    ("graft_tokens", 1, (args: Seq[Expression]) => expr(TextFns.tokens(col(args.head)))),
    ("graft_token_count", 1, (args: Seq[Expression]) => expr(TextFns.tokenCount(col(args.head)))),
    ("graft_bpeish_count", 1, (args: Seq[Expression]) => expr(TextFns.bpeishCount(col(args.head)))),
    ("graft_shingles", 1, (args: Seq[Expression]) => expr(TextFns.shingles(col(args.head)))),
    ("graft_lang_guess", 1, (args: Seq[Expression]) => expr(TextFns.langGuess(col(args.head)))),
    ("graft_quality", 1, (args: Seq[Expression]) => expr(TextFns.qualityScore(col(args.head)))),
    ("graft_fingerprint", 1, (args: Seq[Expression]) => expr(TextFns.fingerprint(col(args.head)))),
    ("graft_bigrams", 1, (args: Seq[Expression]) =>
      expr(TextFns.bigramsOfTokens(col(args.head)))),
    ("graft_top_element_count", 1, (args: Seq[Expression]) =>
      expr(TextFns.topElementCount(col(args.head)))),
    ("graft_dup_token_frac", 1, (args: Seq[Expression]) =>
      expr(TextFns.dupTokenFrac(col(args.head)))),
    ("graft_norm_sq", 1, (args: Seq[Expression]) => expr(VectorFns.normSq(col(args.head)))),
    ("graft_l2_normalize", 1, (args: Seq[Expression]) => expr(VectorFns.l2Normalize(col(args.head)))),
    ("graft_dot", 2, (args: Seq[Expression]) => expr(VectorFns.dot(col(args(0)), col(args(1))))),
    ("graft_cosine", 2, (args: Seq[Expression]) => expr(VectorFns.cosine(col(args(0)), col(args(1))))),
    ("graft_l2sq", 2, (args: Seq[Expression]) => expr(VectorFns.l2Sq(col(args(0)), col(args(1))))),
  )

  private def checked(name: String, arity: Int,
                      b: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args => {
      if (args.length != arity)
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> name, "expectedNum" -> arity.toString,
            "actualNum" -> args.length.toString, "docroot" -> ""))
      b(args)
    }

  // the sourceName is metadata only (DESCRIBE FUNCTION): RollingHash for the
  // native expression, this registrar for the composed Column functions
  private def infoClass(name: String): String =
    if (name == "graft_rolling_hash") classOf[RollingHash].getName
    else if (name == "graft_nfc") classOf[NfcNormalize].getName
    else classOf[GraftExtensions].getName

  private[plans] val descriptors
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    builders.map { case (name, arity, b) =>
      (FunctionIdentifier(name), new ExpressionInfo(infoClass(name), name), checked(name, arity, b))
    }

  /** Column-API surface (requires `register(spark)` or the extensions conf;
    * resolves through the registry so no private Column internals are
    * touched). */
  def rolling_hash(c: Column): Column = call_function("graft_rolling_hash", c)

  /** Register on an already-built session (tests, REPL). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, arity, b) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, checked(name, arity, b), "built-in")
    }
}
