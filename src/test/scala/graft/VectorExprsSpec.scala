package graft

import graft.functions.VectorFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** The native vector kernels (plans/VectorExprs) against their
  * higher-order-function reference forms: identical fold semantics —
  * left-to-right double accumulation, null on length mismatch or null
  * element — so swapping the kNN/IVF scoring loop onto the codegen'd
  * kernels cannot move any oracle-checked result. Bit-for-bit equality is
  * asserted (raw long bits), not approximate closeness. */
class VectorExprsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def bits(d: java.lang.Double): java.lang.Long =
    if (d == null) null else java.lang.Double.doubleToRawLongBits(d)

  /** Evaluate native and HOF forms over the same single-row frame and
    * compare raw bits (nulls must agree too). */
  private def assertSame(df: DataFrame): Unit = {
    val rows = df.collect()
    rows.foreach { r =>
      def d(i: Int): java.lang.Double = if (r.isNullAt(i)) null else r.getDouble(i)
      assert(bits(d(0)) === bits(d(1)), s"native vs hof mismatch in ${df.columns(0)}: $r")
    }
  }

  private def pairFrame(a: Seq[Option[Double]], b: Seq[Option[Double]]): DataFrame =
    Seq((a, b)).toDF("a", "b")

  test("dot / l2sq / normSq / cosine: native ≡ HOF bit-for-bit on random vectors") {
    val genVec = for {
      n  <- Gen.choose(0, 24)
      xs <- Gen.listOfN(n, Gen.chooseNum(-1e3, 1e3))
    } yield xs
    // property evaluated in batches: collect cases first, run one Spark job
    val cases = (1 to 60).flatMap { i =>
      val seed = org.scalacheck.rng.Seed(i.toLong)
      val p = Gen.zip(genVec, genVec).apply(Gen.Parameters.default, seed)
      p.map { case (x, y) =>
        val n = math.min(x.length, y.length)
        (x.take(n), y.take(n)) // same length: the value path (mismatch tested below)
      }
    }
    val df = cases.toDF("a", "b")
    assertSame(df.select(VectorFns.dot($"a", $"b"), VectorFns.hofDot($"a", $"b")))
    assertSame(df.select(VectorFns.l2Sq($"a", $"b"), VectorFns.hofL2Sq($"a", $"b")))
    assertSame(df.select(VectorFns.normSq($"a"), VectorFns.hofNormSq($"a")))
    assertSame(df.filter(size($"a") > 0)
      .select(VectorFns.cosine($"a", $"b"), VectorFns.hofCosine($"a", $"b")))
  }

  test("null semantics match the HOF forms: null element, length mismatch, null array") {
    val mism = pairFrame(Seq(Some(1.0), Some(2.0)), Seq(Some(1.0), Some(2.0), Some(3.0)))
    assertSame(mism.select(VectorFns.dot($"a", $"b"), VectorFns.hofDot($"a", $"b")))
    assertSame(mism.select(VectorFns.l2Sq($"a", $"b"), VectorFns.hofL2Sq($"a", $"b")))
    assert(mism.select(VectorFns.dot($"a", $"b")).collect()(0).isNullAt(0))

    val withNull = pairFrame(Seq(Some(1.0), None, Some(3.0)), Seq(Some(1.0), Some(2.0), Some(3.0)))
    assertSame(withNull.select(VectorFns.dot($"a", $"b"), VectorFns.hofDot($"a", $"b")))
    assertSame(withNull.select(VectorFns.normSq($"a"), VectorFns.hofNormSq($"a")))
    assert(withNull.select(VectorFns.normSq($"a")).collect()(0).isNullAt(0))

    val nullArr = Seq((Option.empty[Seq[Double]], Option(Seq(1.0))))
      .toDF("a", "b")
    assert(nullArr.select(VectorFns.dot($"a", $"b")).collect()(0).isNullAt(0))
    assert(nullArr.select(VectorFns.normSq($"a")).collect()(0).isNullAt(0))
  }

  test("float arrays coerce through the implicit cast exactly as the HOFs do") {
    val f = Seq((Seq(1.5f, -2.25f, 3.125f), Seq(0.5f, 4.0f, -1.0f))).toDF("a", "b")
    assertSame(f.select(VectorFns.dot($"a", $"b"),
      VectorFns.hofDot($"a".cast("array<double>"), $"b".cast("array<double>"))))
    assertSame(f.select(VectorFns.cosine($"a", $"b"),
      VectorFns.hofCosine($"a".cast("array<double>"), $"b".cast("array<double>"))))
  }

  test("l2Normalize: unit norm, zero-vector passthrough, null propagation, cosine≡L2 rank") {
    val df = Seq(
      (1L, Seq(3.0, 4.0)),
      (2L, Seq(0.0, 0.0)),
      (3L, Seq(-1.0, 1.0))).toDF("vec_id", "a")
    val got = df.select($"vec_id", VectorFns.l2Normalize($"a").as("u"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    assert(got(0)._2 === Seq(0.6, 0.8))
    assert(got(1)._2 === Seq(0.0, 0.0), "zero vector passes through")
    val norm = math.sqrt(got(2)._2.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-12)
    val nul = Seq((Option.empty[Seq[Double]])).toDF("a")
    assert(nul.select(VectorFns.l2Normalize($"a")).collect()(0).isNullAt(0))
    // after normalization cosine order == ascending L2 order (the property
    // that lets L2-space ANN serve cosine workloads)
    val v = tables.embeddings.limit(100)
      .select($"vec_id", VectorFns.l2Normalize($"embedding").as("u"))
    val q = v.limit(1).select($"u".as("qu"))
    val both = v.crossJoin(q)
      .select(VectorFns.cosine($"u", $"qu").as("c"), VectorFns.l2Sq($"u", $"qu").as("d"))
      .as[(Double, Double)].collect()
    val byCos = both.sortBy(-_._1).map(_._2).toSeq
    assert(byCos === byCos.sorted, "descending cosine must equal ascending L2")
  }

  test("interpreted eval path (codegen off) agrees with the generated path") {
    val df = tables.embeddings.limit(64)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val on = df.select($"vec_id", VectorFns.dot($"v", $"v").as("d")).collect().toSeq
    val prev = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val off = df.select($"vec_id", VectorFns.dot($"v", $"v").as("d")).collect().toSeq
      assert(on.map(r => (r.get(0).toString, bits(r.getDouble(1)))).sortBy(_._1) ===
        off.map(r => (r.get(0).toString, bits(r.getDouble(1)))).sortBy(_._1))
    } finally {
      spark.conf.set("spark.sql.codegen.factoryMode", prev)
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("the scoring projection stays inside whole-stage codegen") {
    val df = tables.embeddings
      .select(VectorFns.cosine($"embedding", $"embedding").as("c"))
    df.collect() // materialize so AQE's executed plan carries the "*(n)" stage markers
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"vector kernel fell out of codegen:\n$plan")
  }
}
