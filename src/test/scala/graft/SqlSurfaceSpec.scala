package graft

import graft.functions.{TextFns, VectorFns}
import graft.plans.GraftExtensions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SQL-callable function surface: every GraftExtensions registration
  * must produce exactly what the Column API produces (they share the same
  * expression builders, so this pins the adapter, not a reimplementation).
  * The `spark.sql.extensions` install path uses the identical builder seq
  * via injectFunction. */
class SqlSurfaceSpec extends AnyFunSuite {
  import SparkTestSession._

  GraftExtensions.register(spark)
  tables.registerViews()

  test("text functions: SQL ≡ Column API on the corpus") {
    val viaSql = spark.sql(
      """SELECT doc_id, graft_token_count(text) AS tc, graft_bpeish_count(text) AS bc,
        |  graft_lang_guess(text) AS lg, graft_quality(text) AS q,
        |  graft_fingerprint(text) AS fp, graft_rolling_hash(text) AS rh,
        |  graft_nfc(text) AS nt
        |FROM documents""".stripMargin)
    val viaCol = tables.documents.select(col("doc_id"),
      TextFns.tokenCount(col("text")).as("tc"),
      TextFns.bpeishCount(col("text")).as("bc"),
      TextFns.langGuess(col("text")).as("lg"),
      TextFns.qualityScore(col("text")).as("q"),
      TextFns.fingerprint(col("text")).as("fp"),
      GraftExtensions.rolling_hash(col("text")).as("rh"),
      graft.plans.NfcNormalize.nfcCol(col("text")).as("nt"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
  }

  test("vector functions: SQL ≡ Column API on embeddings") {
    val viaSql = spark.sql(
      """SELECT a.vec_id, graft_cosine(a.embedding, a.embedding) AS c,
        |  graft_dot(a.embedding, a.embedding) AS d,
        |  graft_l2sq(a.embedding, a.embedding) AS z,
        |  graft_norm_sq(a.embedding) AS n
        |FROM embeddings a""".stripMargin)
    val e = col("embedding")
    val viaCol = tables.embeddings.select(col("vec_id"),
      VectorFns.cosine(e, e).as("c"), VectorFns.dot(e, e).as("d"),
      VectorFns.l2Sq(e, e).as("z"), VectorFns.normSq(e).as("n"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
    // self-cosine is 1 (same association in SQL and Column form)
    val cs = viaSql.select(min(col("c")), max(col("c"))).collect()(0)
    assert(math.abs(cs.getDouble(0) - 1.0) < 1e-9 && math.abs(cs.getDouble(1) - 1.0) < 1e-9)
  }

  test("radius search is expressible in pure SQL via graft_cosine") {
    val viaSql = spark.sql(
      """SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
        |  round(graft_cosine(q.embedding, e.embedding), 8) AS cos
        |FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
        |WHERE q.vec_id < 10
        |  AND round(graft_cosine(q.embedding, e.embedding), 8) >= 0.1""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaOp = graft.similarity.Knn.radius(tables.embeddings, "vec_id < 10", 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaSql === viaOp)
    assert(viaOp.nonEmpty)
  }

  test("graft_shingles and graft_tokens compose in SQL") {
    // distinct shingles ≤ raw shingle count = n_tokens - k + 1 (k = 3)
    val violations = spark.sql(
      """SELECT size(graft_shingles(text)) AS ns, size(graft_tokens(text)) AS nt
        |FROM documents WHERE graft_token_count(text) >= 3""".stripMargin)
      .filter(col("ns") > col("nt") - 2)
    assert(violations.count() === 0)
  }

  test("repetition functions: SQL ≡ Column API on the corpus") {
    val viaSql = spark.sql(
      """SELECT doc_id,
        |  graft_dup_token_frac(graft_tokens(text)) AS dup,
        |  graft_top_element_count(graft_tokens(text)) AS toptok,
        |  graft_top_element_count(graft_bigrams(graft_tokens(text))) AS topbg
        |FROM documents""".stripMargin)
    val toks = TextFns.tokens(col("text"))
    val viaCol = tables.documents.select(col("doc_id"),
      TextFns.dupTokenFrac(toks).as("dup"),
      TextFns.topElementCount(toks).as("toptok"),
      TextFns.topElementCount(TextFns.bigramsOfTokens(toks)).as("topbg"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
  }

  test("wrong arity raises an AnalysisException, not an internal error") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_cosine(embedding) FROM embeddings").collect()
    }
    assert(e.getMessage.contains("graft_cosine"))
  }
}
