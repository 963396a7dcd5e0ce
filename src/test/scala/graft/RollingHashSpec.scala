package graft

import graft.plans.{GraftExtensions, RollingHash}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RollingHashSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  GraftExtensions.register(spark)

  test("expression matches the reference JVM implementation") {
    val texts = Seq("", "a", "hello world", "日本語テキスト", "x" * 1000)
    val got = texts.toDF("t")
      .select(GraftExtensions.rolling_hash(col("t"))).collect().map(_.getLong(0))
    val want = texts.map(s => RollingHash.hash(s.getBytes("UTF-8")))
    assert(got.toSeq === want)
  }

  test("SQL surface and Column surface agree on the corpus") {
    tables.documents.createOrReplaceTempView("docs_rh")
    val viaSql = spark.sql("SELECT doc_id, graft_rolling_hash(text) AS h FROM docs_rh")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaCol = tables.documents
      .select(col("doc_id"), GraftExtensions.rolling_hash(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql === viaCol)
  }

  test("null input yields null") {
    val rows = Seq(Some("x"), None).toDF("t")
      .select(GraftExtensions.rolling_hash(col("t")).as("h")).collect()
    assert(!rows(0).isNullAt(0) && rows(1).isNullAt(0))
  }

  test("codegen stays on over a parquet scan (no fallback to interpreted)") {
    val df = tables.documents
      .select(GraftExtensions.rolling_hash(col("text")).as("h"))
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("*("),
      "rolling hash fell out of whole-stage codegen")
  }
}
