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
