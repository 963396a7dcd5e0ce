package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.InnerLike
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Push costly single-sided expressions below inner joins.
  *
  * The pair-scoring shape — `corpus JOIN broadcast(queries)` followed by a
  * projection computing `dot(qv,v) / (sqrt(normSq(qv)) * sqrt(normSq(v)))` —
  * evaluates every subexpression once per OUTPUT pair (|Q|·|corpus| rows).
  * But `sqrt(normSq(qv))` only references the build side and
  * `sqrt(normSq(v))` only the stream side: each is computable once per
  * INPUT row and carried through the join as a column. For an n×n scoring
  * join that turns 2·n² norm kernels into 2·n — measured ~2.7× on the exact
  * kNN-graph scoring stage (s08) at sf0.1, and the ratio only grows with
  * fan-out. At 100 TB this is the difference between "norms are free" and
  * "the join recomputes the whole corpus' norms once per query batch".
  *
  * Catalyst has no such rule (projection pushdown moves whole attributes,
  * not subexpressions), so the engine provides it as a logical `Rule`
  * registered via [[GraftExtensions]] / `experimental.extraOptimizations`.
  *
  * Safety:
  *   - inner-like joins only: under an outer join the other side's
  *     null-extension would turn "evaluate e on a real row" into "null",
  *     which differs for null-tolerant expressions (`coalesce`, `isnull`);
  *     under semi/anti joins pushing down would *add* work for rows the
  *     join filters out.
  *   - deterministic expressions only, hoisted whole (maximal one-sided
  *     subtree), so the arithmetic and its evaluation order are unchanged —
  *     results stay bit-identical (PushdownSpec pins this).
  *   - only subtrees containing a native vector kernel are hoisted: the
  *     point is skipping real per-pair work, not churning the plan for
  *     `col + 1`.
  *   - rewritten operators re-emit their original output (same attributes,
  *     same order), so parents — including positional ones like Union —
  *     never see the carrier columns.
  */
object PushCostlyProjectionThroughJoin extends Rule[LogicalPlan] {

  /** Worth hoisting = contains at least one native vector kernel. */
  private def isCostly(e: Expression): Boolean = e.exists {
    case _: VecDot | _: VecNormSq | _: VecL2Sq | _: VecL2Normalize => true
    case _ => false
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(list, j: Join) if j.joinType.isInstanceOf[InnerLike] =>
      rewriteOver(j, list) match {
        case Some((newList, newJoin)) =>
          Project(newList.map(_.asInstanceOf[NamedExpression]), newJoin)
        case None => p
      }
    case a @ Aggregate(grouping, aggs, PrunedJoin(j, pruning), hint)
        if j.joinType.isInstanceOf[InnerLike] =>
      // post-CollapseProject shape: the scoring projection lives inline in
      // the aggregate expressions (inside the aggregate function's inputs —
      // still evaluated once per joined input row, so hoisting is identical).
      // ColumnPruning may leave an attribute-only Project between the two;
      // it is rebuilt to carry the hoisted columns through.
      rewriteOver(j, grouping ++ aggs) match {
        case Some((newExprs, newJoin)) =>
          val (newGrouping, newAggs) = newExprs.splitAt(grouping.length)
          val added = newJoin.output.filterNot(j.outputSet.contains)
          val child = pruning match {
            case Some(list) => Project(list ++ added, newJoin)
            case None       => newJoin
          }
          Aggregate(newGrouping, newAggs.map(_.asInstanceOf[NamedExpression]), child, hint)
        case None => a
      }
    case f @ Filter(cond, j: Join) if j.joinType.isInstanceOf[InnerLike] =>
      rewriteOver(j, Seq(cond)) match {
        // re-project to the join's original output so the carrier columns
        // never escape (parents may consume Filter output positionally)
        case Some((Seq(newCond), newJoin)) => Project(j.output, Filter(newCond, newJoin))
        case None                          => f
      }
  }

  /** A Join, optionally under a column-pruning (attribute-only) Project. */
  private object PrunedJoin {
    def unapply(p: LogicalPlan): Option[(Join, Option[Seq[NamedExpression]])] = p match {
      case j: Join => Some((j, None))
      case Project(list, j: Join) if list.forall(_.isInstanceOf[Attribute]) =>
        Some((j, Some(list)))
      case _ => None
    }
  }

  /** Rewrite `exprs` over join `j`, hoisting maximal deterministic costly
    * one-sided subtrees into Projects below the join. None = no change. */
  private def rewriteOver(j: Join, exprs: Seq[Expression]): Option[(Seq[Expression], Join)] = {
    val pushedL = mutable.LinkedHashMap.empty[Expression, Alias]
    val pushedR = mutable.LinkedHashMap.empty[Expression, Alias]

    def sideOf(e: Expression): Option[mutable.LinkedHashMap[Expression, Alias]] =
      if (!e.deterministic || e.references.isEmpty || !isCostly(e)) None
      else if (e.references.subsetOf(j.left.outputSet)) Some(pushedL)
      else if (e.references.subsetOf(j.right.outputSet)) Some(pushedR)
      else None

    def rewrite(e: Expression): Expression = e match {
      case a: Attribute => a
      case _ =>
        sideOf(e) match {
          case Some(m) =>
            m.getOrElseUpdate(e.canonicalized, Alias(e, "_graft_pushed")()).toAttribute
          case None => e.mapChildren(rewrite)
        }
    }

    // top-level aliases keep their name/exprId — only their children move
    val newExprs = exprs.map {
      case a: Attribute => a
      case e            => e.mapChildren(rewrite)
    }
    if (pushedL.isEmpty && pushedR.isEmpty) None
    else {
      val nl = if (pushedL.isEmpty) j.left else Project(j.left.output ++ pushedL.values, j.left)
      val nr = if (pushedR.isEmpty) j.right else Project(j.right.output ++ pushedR.values, j.right)
      Some((newExprs, j.copy(left = nl, right = nr)))
    }
  }
}
