package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.{Knn, TopKAgg}

/** The physical top-k operator ([[graft.plans.TopKPerKeyNode]] +
  * TopKLocalExec/TopKFinalExec) against its semantic reference, the
  * [[TopKAgg]] Aggregator route. */
class TopKSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def collect4(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.get(0).toString, r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("physical operator equals the Aggregator route on the scoring frame") {
    val emb = tables.embeddings
    val v = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = v.filter(col("vec_id") < 7)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val scored = v.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(graft.functions.VectorFns.cosine(col("qv"), col("v")), 8).as("cos"))
    val fast = Knn.topKPerKey(scored, 5)
    val ref = Knn.topKPerKeyAgg(scored, 5)
    // the fast path actually IS the custom operator
    val plan = fast.queryExecution.executedPlan.toString
    assert(plan.contains("TopKFinal") && plan.contains("TopKLocal"),
      s"expected the physical operator:\n$plan")
    assert(plan.contains("Exchange hashpartitioning"),
      "the final merge must sit behind a key exchange")
    assert(collect4(fast) === collect4(ref))
  }

  test("string keys route through the operator too (the p24 shape)") {
    val scored = Seq(
      ("a", 1L, 0.9), ("a", 2L, 0.8), ("a", 3L, 0.7),
      ("b", 4L, 0.5), ("b", 5L, 0.6))
      .toDF("query_id", "neighbor_id", "cos")
    val fast = Knn.topKPerKey(scored, 2)
    assert(fast.queryExecution.executedPlan.toString.contains("TopKFinal"))
    assert(collect4(fast) === collect4(Knn.topKPerKeyAgg(scored, 2)))
    assert(collect4(fast) === Seq(
      ("a", 1, 1L, 0.9), ("a", 2, 2L, 0.8), ("b", 1, 5L, 0.6), ("b", 2, 4L, 0.5)))
  }

  test("boundary ties resolve to the smaller id, exactly as the Aggregator") {
    val scored = Seq(
      (1L, 10L, 0.5), (1L, 7L, 0.5), (1L, 3L, 0.5), (1L, 9L, 0.5),
      (1L, 1L, 0.9))
      .toDF("query_id", "neighbor_id", "cos")
    val got = collect4(Knn.topKPerKey(scored, 3))
    assert(got === Seq(("1", 1, 1L, 0.9), ("1", 2, 3L, 0.5), ("1", 3, 7L, 0.5)))
    assert(got === collect4(Knn.topKPerKeyAgg(scored, 3)))
  }

  test("BoundedTopK agrees with TopKAgg on random streams (merge law included)") {
    val rnd = new scala.util.Random(42)
    val agg = new TopKAgg(5)
    (1 to 50).foreach { _ =>
      val xs = Array.fill(200)((rnd.nextInt(20).toDouble / 10.0, rnd.nextInt(1000).toLong))
      val heap = new graft.plans.BoundedTopK(5)
      xs.foreach { case (s, id) => heap.insert(s, id) }
      val ref = xs.foldLeft(agg.zero)((b, a) => agg.reduce(b, a))
      val got = (0 until heap.size).map(i => (heap.scores(i), heap.ids(i)))
      assert(got.toList === ref, s"stream mismatch")
      // two-heap split ≡ one heap (the local/final phase law)
      val (l, r) = xs.splitAt(97)
      val h1 = new graft.plans.BoundedTopK(5); l.foreach { case (s, id) => h1.insert(s, id) }
      val h2 = new graft.plans.BoundedTopK(5); r.foreach { case (s, id) => h2.insert(s, id) }
      val merged = new graft.plans.BoundedTopK(5)
      (0 until h1.size).foreach(i => merged.insert(h1.scores(i), h1.ids(i)))
      (0 until h2.size).foreach(i => merged.insert(h2.scores(i), h2.ids(i)))
      val got2 = (0 until merged.size).map(i => (merged.scores(i), merged.ids(i)))
      assert(got2.toList === ref, "split-merge must equal the single stream")
    }
  }

  test("unsupported shapes fall back to the Aggregator route") {
    val scored = Seq((1, 2L, 0.5)).toDF("query_id", "neighbor_id", "cos") // Int key
    val df = Knn.topKPerKey(scored, 1)
    assert(!df.queryExecution.executedPlan.toString.contains("TopKFinal"))
    assert(df.collect().length === 1)
  }
}
