package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Input-growth scaling harness for the r15 judge's measurement gap: at
  * sf0.1 the bench runs ~1900 jobs at ~80 ms/job of fixed overhead, so
  * per-query times are SCHEDULER-bound and can support no parallelism or
  * data-scaling claim (the 8-core total even beat the 32-core one). This
  * tool measures a representative optimized subset (d15, q93, t27, d17,
  * p34 — the round-15/16 rewrite targets) on AMPLIFIED copies of the sf0.1
  * inputs, where data cost dominates the job-overhead floor:
  *
  *   - documents ×m: copy i remaps doc_id by +i·(max+1) and SUFFIXES every
  *     token with a copy-specific marker (i = 0 keeps the original text) —
  *     a per-copy renaming of the token alphabet, so each copy's shingle
  *     set is ISOMORPHIC to the original's (identical per-copy jaccard
  *     structure, identical pair counts) while NO shingle is shared across
  *     copies: the pair/cluster workload grows exactly linearly in m.
  *     (Plain replication would make every doc an m-way duplicate and
  *     measure a quadratically blown-up problem; an earlier interleaved-
  *     marker variant created token-level shingles that INFLATED pair
  *     density in the marked copies — both measure the wrong thing.);
  *   - lineitem ×m: copy i remaps l_orderkey by +i·(max+1) (part keys keep
  *     their domain, so q93's per-part basket counts grow m-fold — the
  *     real growth mode of a co-occurrence table).
  *
  * Session memos are dropped before EVERY timed query so each entry pays
  * its own shared kernels at every multiplier — comparable across
  * multipliers and core counts. Reads the core count from
  * `$SPARK_GRAFT_CPUS` (run once at 32 and once at 8 for the core-ratio
  * table), multipliers from `$SPARK_GRAFT_SCALE_MULTS` (default "1,2,4"),
  * reps from `$SPARK_GRAFT_REPS` (default 2, per-query median). Writes one
  * compact JSON line to stdout and to `$SPARK_GRAFT_SCALE_OUT` (default
  * `SCALING_UP_LOCAL.c<cpus>.json`). Amplified inputs land under
  * /tmp/graft_scaleup/m<m>/ and are rebuilt per run — nothing under
  * /root/testdata is touched, and no query result is reused anywhere
  * (this is a measurement harness, not a bench entry: the driver's bench
  * contract and artifacts are unchanged). */
object ScalingUp {

  val subset: Seq[String] = Seq(
    "d15_incremental_clusters", "q93_basket_affinity", "t27_chi2_keyness",
    "d17_pair_evidence", "p34_neardup_contamination")

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted; val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  /** Write the ×m amplification of `src` under `outDir` (documents +
    * lineitem — the only tables the subset touches). */
  private def amplify(spark: SparkSession, src: String, outDir: String,
                      m: Int): Unit = {
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val docSpan = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
    val docCopies = (0 until m).map { i =>
      val copy = docs.withColumn("doc_id", col("doc_id") + lit(i * docSpan))
      if (i == 0) copy
      else copy.withColumn("text",
        array_join(transform(split(col("text"), " "),
          t => concat(t, lit(s"zz${i}qq"))), " "))
    }
    docCopies.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val li = spark.read.parquet(s"$src/lineitem.parquet")
    val liSpan = li.agg(max(col("l_orderkey"))).head().getLong(0) + 1L
    (0 until m).map(i =>
        li.withColumn("l_orderkey", col("l_orderkey") + lit(i * liSpan)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
  }

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt)
    val mults = sys.env.getOrElse("SPARK_GRAFT_SCALE_MULTS", "1,2,4")
      .split(",").map(_.trim.toInt).filter(_ >= 1).toSeq
    val loadAvg = try {
      scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0).toDouble
    } catch { case _: Throwable => -1.0 }
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dirs = mults.map { m =>
      val d = s"/tmp/graft_scaleup/m$m"
      spark.sparkContext.setJobDescription(s"scaleup: amplify x$m")
      amplify(spark, src, d, m)
      m -> d
    }
    // warmup (codegen/footers — the Bench discipline)
    try graft.SparkEntry.queries("q01_agg")(spark, src).count()
    catch { case _: Throwable => () }
    val samples = scala.collection.mutable.Map
      .empty[(String, Int), Vector[Double]]
    for (rep <- 1 to reps; (m, d) <- dirs; name <- subset) {
      // each timed entry pays its own shared kernels: comparable across
      // multipliers/cores, nothing amortized into an untimed neighbor
      graft.SessionCaches.release(spark)
      spark.sparkContext.setJobDescription(s"scaleup x$m rep$rep: $name")
      val t0 = System.nanoTime()
      val sec = try {
        graft.SparkEntry.queries(name)(spark, d)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"SCALEUP FAIL $name x$m: $e"); -1.0 }
      samples((name, m)) = samples.getOrElse((name, m), Vector.empty) :+ sec
    }
    val byQuery = subset.map { name =>
      val per = mults.map { m =>
        val xs = samples((name, m))
        m -> (if (xs.exists(_ < 0)) -1.0 else median(xs))
      }
      // exponent between the two largest multipliers: log(time ratio) over
      // log(input ratio) — the Scaling.scala convention
      val exp = per.takeRight(2) match {
        case Seq((m1, t1), (m2, t2)) if t1 > 0 && t2 > 0 && m2 > m1 =>
          math.log(t2 / t1) / math.log(m2.toDouble / m1)
        case _ => Double.NaN
      }
      val secs = per.map { case (m, t) => s"\"x$m\":" + f"$t%.3f" }
        .mkString("{", ",", "}")
      s""""$name":{"sec":$secs,"exponent":""" + f"$exp%.3f" + "}"
    }.mkString("{", ",", "}")
    val line = s"""{"metric":"scaling_up","cpus":$cpus,"reps":$reps,""" +
      s""""pre_run_load_1m":$loadAvg,"mults":[${mults.mkString(",")}],""" +
      s""""src":"$src","queries":$byQuery}"""
    println(line)
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT",
      s"SCALING_UP_LOCAL.c$cpus.json")
    try Files.write(Paths.get(out),
      (line + "\n").getBytes(StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"SCALING_UP write failed: $e") }
    spark.stop()
  }
}
