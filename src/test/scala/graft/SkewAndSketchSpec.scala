package graft

import graft.operators.SkewOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew-salting equivalence + the approximate-aggregate (sketch) toolkit
  * that replaces exact global distincts at 100 TB. */
class SkewAndSketchSpec extends AnyFunSuite {
  import SparkTestSession._

  test("salted join returns exactly the rows of the plain join") {
    val big = tables.lineitem.select("l_orderkey", "l_suppkey", "l_quantity")
    val small = tables.supplier.select(col("s_suppkey").as("l_suppkey"), col("s_name"))
    val plain = big.join(small, "l_suppkey")
    val salted = SkewOps.saltedJoin(big, small, "l_suppkey", n = 8)
    assert(salted.count() === plain.count())
    val a = plain.groupBy("l_suppkey").count().collect().map(r => r.get(0) -> r.getLong(1)).toMap
    val b = salted.groupBy("l_suppkey").count().collect().map(r => r.get(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("salted join rejects a big side with provably constant per-key salt") {
    val big = tables.lineitem.select("l_suppkey")
    val small = tables.supplier.select(col("s_suppkey").as("l_suppkey"), col("s_name"))
    val e = intercept[IllegalArgumentException] {
      SkewOps.saltedJoin(big, small, "l_suppkey", n = 8)
    }
    assert(e.getMessage.contains("saltExpr"))
    // the same shape with an explicit unique-column salt is accepted
    val withSalt = SkewOps.saltedJoin(
      tables.lineitem.select("l_suppkey", "l_orderkey"), small, "l_suppkey", n = 8,
      saltExpr = Some(xxhash64(col("l_orderkey"))))
    assert(withSalt.count() ===
      tables.lineitem.select("l_suppkey", "l_orderkey").join(small, "l_suppkey").count())
  }

  test("heavy hitters finds the hottest join keys") {
    val hh = SkewOps.heavyHitters(tables.lineitem, col("l_suppkey"), 5).collect()
    assert(hh.length === 5)
    assert(hh.map(_.getLong(1)).toSeq === hh.map(_.getLong(1)).sortBy(-_).toSeq)
  }

  test("approx_percentile tracks exact percentile within accuracy bound") {
    val r = tables.lineitem.agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact"),
      expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx")).collect()(0)
    assert(math.abs(r.getDouble(0) - r.getDouble(1)) / r.getDouble(0) < 0.02)
  }

  test("count_min_sketch estimates frequencies within epsilon") {
    val sketch = tables.lineitem.select(col("l_returnflag"))
      .stat.countMinSketch("l_returnflag", eps = 0.001, confidence = 0.99, seed = 42)
    val exact = tables.lineitem.groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = exact.values.sum
    exact.foreach { case (k, n) =>
      val est = sketch.estimateCount(k)
      assert(est >= n && est <= n + (0.001 * total).toLong + 1, s"$k: est=$est exact=$n")
    }
  }
}
