package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFns
import graft.plans.PushCostlyProjectionThroughJoin

/** [[graft.plans.PushCostlyProjectionThroughJoin]]: the engine's
  * costly-subexpression pushdown below inner joins. Three properties:
  * it fires (plan shape), it is invisible (bit-identical results vs the
  * rule disabled), and it refuses the unsafe shapes (outer joins). */
class PushdownSpec extends AnyFunSuite {
  import SparkTestSession._

  private def emb = tables.embeddings
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  private def scoringPairs = {
    val q = emb.select(col("vec_id").as("query_id"), col("v").as("qv"))
    emb.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(VectorFns.cosine(col("qv"), col("v")), 8).as("cos"))
  }

  private def withoutRule[A](f: => A): A = {
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      saved.filterNot(_ == PushCostlyProjectionThroughJoin)
    try f finally spark.experimental.extraOptimizations = saved
  }

  test("norm subtrees hoist below the join, once per side") {
    val plan = scoringPairs.queryExecution.optimizedPlan.treeString
    val pushed = plan.split("\n").count(_.contains("_graft_pushed"))
    // 2 definitions (one per side) + 2 references in the cosine projection
    assert(pushed >= 3, s"expected hoisted norm columns:\n$plan")
    // the join's children each compute their own norm
    val joinLine = plan.split("\n").indexWhere(_.contains("Join Inner"))
    assert(joinLine >= 0, plan)
    val below = plan.split("\n").drop(joinLine + 1)
    assert(below.exists(l => l.contains("graft_norm_sq") && l.contains("_graft_pushed")),
      s"norm kernel must evaluate below the join:\n$plan")
    // no norm kernel survives above the join (dot stays — it needs both sides)
    val above = plan.split("\n").take(joinLine)
    assert(!above.exists(_.contains("graft_norm_sq")),
      s"per-pair norm recomputation survived the rewrite:\n$plan")
  }

  test("results are bit-identical with the rule disabled") {
    val got = scoringPairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val want = withoutRule {
      scoringPairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    }
    // bit-identical, not approximately-equal: the hoist must not reassociate
    assert(got.sortBy(t => (t._1, t._2)).toSeq === want.sortBy(t => (t._1, t._2)).toSeq)
  }

  test("outer joins are left alone (null-extension semantics)") {
    val q = emb.select(col("vec_id").as("query_id"), col("v").as("qv"))
      .filter(col("query_id") < 3)
    val outer = emb.join(q, col("vec_id") === col("query_id"), "left")
      .select(col("vec_id"),
        // null-tolerant: evaluates to -1 on null-extended rows; pushing it
        // below the join would yield NULL there instead
        coalesce(round(VectorFns.normSq(col("qv")), 8), lit(-1.0)).as("nq"))
    val plan = outer.queryExecution.optimizedPlan.treeString
    assert(!plan.contains("_graft_pushed"), s"rule must skip outer joins:\n$plan")
    val n = outer.filter(col("nq") === -1.0).count()
    assert(n === emb.count() - 3, "null-extended rows must keep the coalesce fallback")
  }

  test("aggregate-over-join shape hoists too") {
    val q = emb.select(col("vec_id").as("query_id"), col("v").as("qv"))
    // no intermediate select: aggregate directly over the join so the
    // costly expression sits inline in the aggregate's input
    val agg = emb.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"))
      .agg(sum(round(VectorFns.cosine(col("qv"), col("v")), 8)).as("s"))
    val plan = agg.queryExecution.optimizedPlan.treeString
    assert(plan.contains("_graft_pushed"), s"expected hoist under Aggregate:\n$plan")
    val got = agg.collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    val want = withoutRule(
      agg.collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1))
    assert(got.toSeq === want.toSeq)
  }
}
