package graft

import graft.ml.MlOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MLlib-native LSH paths (MinHashLSH, BucketedRandomProjectionLSH) — the
  * library counterparts of the hand-rolled banded implementations in
  * graft.dedup / graft.similarity. */
class MlLshSpec extends AnyFunSuite {
  import SparkTestSession._

  test("MinHashLSH candidates cover the exact n-gram Jaccard near-dup pairs") {
    val exact = graft.dedup.Dedup.ngramJaccardPairs(tables.documents, threshold = 0.8)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain near-dup pairs")
    val ml = MlOps.mlMinHashNearDups(tables.documents, maxDistance = 0.25)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // OR-amplified over 8 tables: miss probability per j>=0.8 pair ~ (0.2)^8
    assert(exact.subsetOf(ml),
      s"MLlib path missed exact pairs: ${exact.diff(ml).take(5)}")
  }

  test("BucketedRandomProjectionLSH pairs report true euclidean distances") {
    val pairs = MlOps.mlEuclideanNearDups(spark, tables.embeddings, radius = 4.0)
    val got = pairs.collect()
    assert(got.nonEmpty)
    assert(got.forall(_.getDouble(2) <= 4.0))
    // recompute one distance exactly from the source embeddings
    val r = got.head
    val vecs = tables.embeddings
      .filter(col("vec_id").isin(r.getLong(0), r.getLong(1)))
      .select("vec_id", "embedding").collect()
      .map(x => x.getLong(0) -> x.getSeq[Float](1).toArray).toMap
    val (a, b) = (vecs(r.getLong(0)), vecs(r.getLong(1)))
    val d = math.sqrt(a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum)
    assert(math.abs(d - r.getDouble(2)) < 1e-4)
  }
}
