package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  import SparkTestSession._

  test("minhash-LSH reproduces the exact n-gram-Jaccard pair set") {
    val exact = Dedup.ngramJaccardPairs(tables.documents).select("d1", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minHashLshPairs(tables.documents).select("d1", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh === exact)
    assert(exact.nonEmpty, "test corpus should contain planted near-dups")
  }

  test("exact dedup: fingerprints count matches distinct normalized texts") {
    val n = Dedup.exact(tables.documents).count()
    val d = tables.documents
      .select(trim(regexp_replace(lower(col("text")), "\\s+", " "))).distinct().count()
    assert(n === d)
  }

  test("simhash: near-dup pairs (jaccard>=0.8) sit at small hamming distance") {
    val nearDups = Dedup.ngramJaccardPairs(tables.documents, 0.9)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1)))
    val sh = Dedup.simHash(tables.documents).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    nearDups.foreach { case (a, b) =>
      val ham = java.lang.Long.bitCount(sh(a) ^ sh(b))
      assert(ham <= 8, s"near-dup pair ($a,$b) has hamming $ham")
    }
  }

  test("simhash pairs are symmetric-free and under the hamming cap") {
    val rows = Dedup.simHashPairs(tables.documents).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getInt(2) <= 3)
    }
  }

  test("embedding dup pairs respect the threshold") {
    val rows = Dedup.embeddingDupPairs(tables.embeddings, 0.45).collect()
    rows.foreach(r => assert(r.getDouble(2) >= 0.45))
  }

  test("clean-corpus pipeline composes its stage invariants") {
    val cleaned = graft.operators.CorpusPipeline.cleanCorpus(tables).collect()
    assert(cleaned.nonEmpty && cleaned.length < tables.documents.count())
    // every survivor satisfies each stage's predicate
    assert(cleaned.forall(_.getAs[String]("guess") == "en"))
    assert(cleaned.forall(_.getAs[Double]("quality") >= 0.5))
    val ids = cleaned.map(_.getAs[Long]("doc_id")).toSet
    val followers = Dedup.ngramJaccardPairs(tables.documents)
      .select("d2").collect().map(_.getLong(0)).toSet
    assert(ids.intersect(followers).isEmpty, "near-dup followers must be dropped")
    val keepers = Dedup.exact(tables.documents)
      .select("keep_id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(keepers), "only exact-dup group keepers may survive")
  }
}
