package graft

import graft.similarity.Srp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SrpSpec extends AnyFunSuite {
  import SparkTestSession._

  /** JVM mirror of the engine's signature pipeline: s03 quantization
    * (floor(x/scale + 0.5)) then integer ±1 projections. */
  private def jvmSignature(v: Array[Double]): Array[Int] = {
    val scale = math.max(v.map(math.abs).max, 1e-30) / 127.0
    val q = v.map(x => math.floor(x / scale + 0.5).toInt)
    Srp.signs.map { plane =>
      var s = 0; var i = 0
      while (i < q.length) { s += plane(i) * q(i); i += 1 }
      if (s >= 0) 1 else 0
    }
  }

  test("s13: emitted pairs are exactly the bucket-colliding pairs above threshold (JVM brute force)") {
    import spark.implicits._
    val emb = tables.embeddings
    val vecs = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect().toMap
    val sigs = vecs.map { case (id, v) => id -> jvmSignature(v) }
    def bucket(sig: Array[Int], band: Int): Int =
      (0 until Srp.RowsPerBand).map(r =>
        sig(band * Srp.RowsPerBand + r) << (Srp.RowsPerBand - 1 - r)).sum
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val ids = vecs.keys.toArray.sorted
    val expected = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      if (0 until Srp.Bands).exists(bd => bucket(sigs(a), bd) == bucket(sigs(b), bd))
      c = BigDecimal(cosine(vecs(a), vecs(b)))
        .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
      if c >= 0.45
    } yield (a, b, c)).toSet
    val got = Srp.srpPairs(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === expected)
    assert(got.nonEmpty, "test embeddings should produce SRP collisions")
  }

  test("s13: identical vectors collide in every band and emit cos 1.0") {
    import spark.implicits._
    val dup = Seq(
      (9001L, Array.tabulate(Srp.Dims)(i => math.sin(i + 1).toFloat)),
      (9002L, Array.tabulate(Srp.Dims)(i => math.sin(i + 1).toFloat)),
      (9003L, Array.tabulate(Srp.Dims)(i => math.cos(3 * i + 2).toFloat))
    ).toDF("vec_id", "embedding")
    val pairs = Srp.srpPairs(dup, threshold = 0.99).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.toSeq === Seq((9001L, 9002L, 1.0)))
  }

  test("s13: recall vs the exact d05 pair set at the same threshold") {
    val exact = graft.dedup.Dedup.embeddingDupPairs(tables.embeddings)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val srp = Srp.srpPairs(tables.embeddings)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // precision vs the exact-cosine criterion is 1 by construction (every
    // emitted pair carries its exact rounded cosine >= tau); d05 rounds at
    // 4 dp vs s13's 8, so compare on the shared criterion: pairs s13 finds
    // must be a superset of exact pairs it bucketed together — the
    // empirical check here is the recall floor on the planted dups
    val recall = if (exact.isEmpty) 1.0
      else exact.count(srp.contains).toDouble / exact.size
    assert(recall >= 0.5, s"SRP recall $recall vs ${exact.size} exact pairs")
  }

  test("s13: plan has no cartesian product — candidates come from the band-bucket join") {
    val plan = Srp.srpPairs(tables.embeddings).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"SRP plan must join on (band, bucket), got:\n$plan")
  }
}
