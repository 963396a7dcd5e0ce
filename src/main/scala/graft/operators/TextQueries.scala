package graft.operators

import graft.Tables
import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis queries over the documents table (LLM-pipeline surface).
  * Thin compositions of the TextFns column library — everything stays in
  * whole-stage codegen; one narrow scan of (doc_id, text[, lang]). */
object TextQueries {

  /** t01: per-document token statistics. */
  def t01TokenStats(t: Tables): DataFrame = {
    val text = col("text")
    t.documents.select(
      col("doc_id"),
      TextFns.tokenCount(text).as("n_tokens"),
      TextFns.bpeishCount(text).as("n_bpeish"),
      TextFns.meanTokenLen(text).as("mean_token_len"),
      TextFns.alphaRatio(text).as("alpha_ratio"))
  }

  /** t02: language-ID heuristic vs the labeled lang column (confusion
    * counts). */
  def t02LangId(t: Tables): DataFrame =
    t.documents
      .select(col("lang"),
        TextFns.stopwordHits(col("text"), TextFns.stopEn).as("c_en"),
        TextFns.stopwordHits(col("text"), TextFns.stopDe).as("c_de"),
        TextFns.stopwordHits(col("text"), TextFns.stopEs).as("c_es"),
        TextFns.stopwordHits(col("text"), TextFns.stopFr).as("c_fr"))
      .select(col("lang"), TextFns.langGuessOfCounts(
        col("c_en"), col("c_de"), col("c_es"), col("c_fr")).as("guess"))
      .groupBy(col("lang"), col("guess"))
      .agg(count(lit(1)).as("n"))

  /** t03: composite quality score per document. */
  def t03Quality(t: Tables): DataFrame =
    t.documents
      .select(col("doc_id"),
        TextFns.tokenCount(col("text")).cast("double").as("nt"),
        TextFns.alphaRatio(col("text")).as("ar"),
        TextFns.stopwordRatio(col("text")).as("sr"))
      .select(col("doc_id"),
        TextFns.qualityScoreOf(col("nt"), col("ar"), col("sr")).as("quality"))

  /** t05: repetition signals (the Gopher-rule family) — fraction of repeated
    * tokens, most-frequent-token share, most-frequent-bigram share. The
    * canonical filter for template/spam/boilerplate docs in a training-data
    * pipeline. Tokens and bigrams bind as attributes in prior projections
    * (HOFs re-evaluate captured expressions per element — see
    * [[graft.functions.TextFns.shingleHashesOfTokens]]); all ratios are
    * integer-derived divisions, so DuckDB reproduces them bit-exactly. */
  def t05Repetition(t: Tables): DataFrame =
    t.documents
      .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        TextFns.bigramsOfTokens(col("toks")).as("bg"))
      .select(
        col("doc_id"),
        size(col("toks")).as("n_tokens"),
        TextFns.dupTokenFrac(col("toks")).as("dup_token_frac"),
        (TextFns.topElementCount(col("toks")).cast("double") /
          size(col("toks")).cast("double")).as("top_token_frac"),
        (TextFns.topElementCount(col("bg")).cast("double") /
          size(col("bg")).cast("double")).as("top_bigram_frac"))
}
