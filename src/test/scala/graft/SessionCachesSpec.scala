package graft

import graft.dedup.Dedup
import graft.similarity.Knn
import org.scalatest.funsuite.AnyFunSuite

/** The session-memo lifetime contract (VERDICT r5 "What's missing" #5):
  * every session-keyed memo (shingle sets, IVF models, table relations)
  * registers with SessionCaches and drains on release — explicitly per
  * session, or wholesale when the context's application ends (the
  * SparkListener backstop for JVMs that forget the explicit call). */
class SessionCachesSpec extends AnyFunSuite {
  import SparkTestSession._

  test("release(session) drains every registered cache for that session only") {
    // an isolated session sharing the test context: its cache entries are
    // keyed separately from the shared session's
    val s2 = spark.newSession()
    val t2 = Tables(s2, sf)
    Dedup.sharedShingles(t2.documents).count() // populates the shingle memo
    Dedup.minHashLshPairs(t2.documents).count() // populates the pair memo
    Knn.ivf(t2.embeddings).count()             // populates the IVF registry
    graft.similarity.Pq.pq(t2.embeddings).count()      // PQ codebooks
    graft.similarity.IvfPq.ivfPq(t2.embeddings).count() // IVF-PQ model
    graft.dedup.Clusters.sharedComponents(             // CC label memo
      Dedup.minHashLshPairs(t2.documents).select("d1", "d2")).count()
    graft.functions.Bpe.sharedModel(t2.documents)      // BPE merge model
    t2.registerViews()                         // populates relCache + lastViews
    assert(SessionCaches.entriesFor(s2) >= 7,
      "every registry family must hold an entry for the session")
    assert(SessionCaches.entriesFor(s2) > 0, "population must register entries")
    val sharedBefore = SessionCaches.entriesFor(spark)
    SessionCaches.release(s2)
    assert(SessionCaches.entriesFor(s2) === 0, "release must drain all maps")
    assert(SessionCaches.entriesFor(spark) === sharedBefore,
      "another session's entries must be untouched")
    // the persisted shingle frame was actually unpersisted, not just dropped
    assert(s2.sharedState.cacheManager.isEmpty ||
      !Dedup.shingleSets(t2.documents).storageLevel.useMemory)
  }

  test("releaseContext drains every session of the context (application-end path)") {
    // the hook installs a SparkListener whose onApplicationEnd calls
    // releaseContext(sc); stopping the shared test context mid-suite would
    // kill every other suite, so this exercises the handler directly —
    // listener delivery on stop is Spark's own contract.
    val s3 = spark.newSession()
    Tables(s3, sf).documents.count()
    Dedup.sharedShingles(Tables(s3, sf).documents).count()
    assert(SessionCaches.entriesFor(s3) > 0)
    SessionCaches.releaseContext(spark.sparkContext)
    assert(SessionCaches.entriesFor(s3) === 0)
    assert(SessionCaches.entriesFor(spark) === 0,
      "context-wide release must cover every session of the context")
  }

  test("repopulation after release works (release is not poisoning)") {
    val t = Tables(spark, sf)
    assert(t.documents.count() > 0)
    assert(SessionCaches.entriesFor(spark) > 0)
    SessionCaches.release(spark)
    assert(t.documents.count() > 0)
  }
}
