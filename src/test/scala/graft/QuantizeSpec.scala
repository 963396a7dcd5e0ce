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

  test("s19: hygiene audit matches a JVM recount; planted degenerates flag") {
    import org.apache.spark.sql.functions._
    import SparkTestSession.spark.implicits._
    val planted = Seq(
      (9001L, Array.fill(64)(0.0)),                    // zero vector
      (9002L, Array.tabulate(64)(i => if (i == 0) Double.NaN else 1.0)), // NaN
      (9003L, Array.fill(32)(1.0)),                    // wrong dim
      (9004L, Array.tabulate(64)(_.toDouble + 1))      // healthy
    ).toDF("vec_id", "embedding")
    val got = graft.similarity.Quantize.vectorQuality(planted).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getDouble(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(got(9001L)._5 && got(9001L)._3 === 64L && got(9001L)._2 === 0.0)
    assert(got(9002L)._5 && got(9002L)._4 === 1L)
    assert(got(9003L)._5 && got(9003L)._1 === 32)
    assert(!got(9004L)._5)
    // real corpus: norm2 matches a JVM sequential fold at 6 dp
    val data = SparkTestSession.tables.embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    graft.similarity.Quantize.vectorQuality(SparkTestSession.tables.embeddings)
      .collect().foreach { r =>
        val v = data(r.getLong(0))
        val n2 = v.foldLeft(0.0)((acc, x) => acc + x * x)
        assert(math.abs(r.getDouble(2) - n2) < 1e-5, s"norm2 for vec ${r.getLong(0)}")
        assert(!r.getBoolean(5), "driver embeddings are healthy")
      }
  }
}
