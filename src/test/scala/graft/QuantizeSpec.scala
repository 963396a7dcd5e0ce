package graft

import graft.similarity.{Knn, Quantize}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** int8 scalar quantization: reconstruction bound, kNN recall cost, and
  * the zero-shuffle plan shape. */
class QuantizeSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val emb = tables.embeddings

  test("s03: reconstruction error is bounded by scale/2 per element") {
    val orig = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect().toMap
    val q = Quantize.quantized(emb)
      .as[(Long, Double, Seq[Byte])].collect()
    assert(q.length === orig.size)
    q.foreach { case (id, scale, qv) =>
      assert(scale > 0)
      assert(qv.forall(b => b >= -127 && b <= 127))
      val v = orig(id)
      assert(qv.length === v.length)
      v.indices.foreach { i =>
        assert(math.abs(qv(i) * scale - v(i)) <= scale / 2 + 1e-12,
          s"vec $id dim $i")
      }
    }
  }

  test("s03: a zero vector quantizes to zeros instead of dividing by zero") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(DoubleType))))
    val z = spark.createDataFrame(
      java.util.List.of(Row(1L, Seq(0.0, 0.0, 0.0))), schema)
    val out = Quantize.quantized(z).as[(Long, Double, Seq[Byte])].collect()
    assert(out.head._3 === Seq[Byte](0, 0, 0))
  }

  test("int8 serving keeps kNN recall high vs exact doubles") {
    val exact = Knn.bruteForce(emb)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val deq = Knn.bruteForce(Quantize.dequantized(emb))
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(deq.keySet === exact.keySet)
    val recalls = exact.map { case (q, ids) =>
      (deq(q) intersect ids).size.toDouble / ids.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean top-5 recall $mean after int8 round-trip")
  }

  test("s03 plan: quantization is scan-local (zero exchanges)") {
    val df = Quantize.quantized(emb)
    df.collect()
    val p = SparkTestSession.finalPlan(df)
    // Tables.widen roundrobin is allowed; no keyed redistribution
    assert(!p.contains("Exchange hashpartitioning") && !p.contains("Exchange rangepartitioning"),
      s"quantize must not shuffle on a key:\n$p")
  }
}
