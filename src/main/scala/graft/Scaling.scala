package graft

import org.apache.spark.sql.SparkSession

/** Measured scaling evidence: run a family-covering query subset at every
  * available scale factor and fit the per-query scaling exponent between
  * the two largest SFs (time ratio over a 10× input ratio, log base 10).
  *
  * Why this exists: the 100 TB claims in SURVEY §8.4 are plan-shape
  * arguments (partial aggregation bounds the exchange, banding bounds the
  * candidate set, serve cost is corpus-free). This harness turns the
  * claims into numbers — a query whose exponent sits near 1 scales with
  * the scan like it says; the two DECLARED quadratic baselines (d05, and
  * s01's q×n brute force) are included on purpose as positive controls:
  * the harness must show THEM super-linear or it isn't measuring anything.
  *
  * Reading the exponent at local[32] sizes: per-job fixed overhead
  * (~0.1-0.4 s/job, measured by Bench's calibration probes) flattens
  * small-SF times, so exponents UNDERSTATE the asymptotic slope — an
  * exponent near 1 is evidence against super-linearity, while an exponent
  * well above 1 at these sizes is already the quadratic term dominating
  * overhead, i.e. a loud alarm. Exponents are computed from the largest
  * SF pair only, where data cost most exceeds overhead.
  *
  * Output: one JSON line per (sf, query) as it runs, then one summary
  * line {"metric":"scaling",...} with per-query seconds at each SF and
  * the fitted exponent; also written to SCALING_LOCAL.json.
  */
object Scaling {
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted; val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  /** Family-covering subset: relational agg/join/window/top-k, exact and
    * LSH dedup, brute and served ANN, text scan ops, pipeline ops — plus
    * the declared-quadratic controls (d05 pairs, s01 q×n, d03's banded
    * contrast to d05, d06/s02 as the corpus-free serve contrasts). */
  val subset: Seq[String] = Seq(
    "q01_agg", "q03_join_agg", "q08_window_rank", "q10_topk",
    "d01_dedup_exact", "d03_minhash_lsh", "d05_embedding_dup",
    "d06_embedding_dup_ivf", "s01_knn_brute", "s02_knn_ivf",
    "t03_quality", "t08_bpe_encode",
    "p02_decontaminate", "p05_pack_sequences", "p21_shard_manifest",
    "p57_chunk_windows")

  def main(args: Array[String]): Unit = {
    val sfDirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt)
    val loadAvg = try {
      scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0).toDouble
    } catch { case _: Throwable => -1.0 }
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = sys.env.get("SPARK_GRAFT_ONLY") match {
      case Some(s) =>
        val keep = s.split(",").map(_.trim).filter(_.nonEmpty).toSet
        subset.filter(keep)
      case None => subset.filter(SparkEntry.queries.contains)
    }
    // sf -> query -> median sec; also record the scan-side row counts so
    // the summary ties exponents to actual input growth, not nominal SF
    val times = scala.collection.mutable.Map.empty[(String, String), Double]
    val rows = scala.collection.mutable.Map.empty[String, Map[String, Long]]
    for (sfDir <- sfDirs) {
      val t = Tables(spark, sfDir)
      rows(sfDir) = Map(
        "lineitem" -> t.lineitem.count(),
        "documents" -> t.documents.count(),
        "embeddings" -> t.embeddings.count())
      // warmup per SF: footers, codegen, broadcast of dims
      try SparkEntry.queries("q01_agg")(spark, sfDir).count()
      catch { case _: Throwable => () }
      for (name <- names) {
        val samples = (1 to reps).map { _ =>
          SessionCaches.release(spark)
          val t0 = System.nanoTime()
          val ok = try { SparkEntry.queries(name)(spark, sfDir).count(); true }
            catch { case e: Throwable =>
              System.err.println(s"SCALING FAIL $name @ $sfDir: $e"); false }
          if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
        }
        val m = if (samples.exists(_ < 0)) -1.0 else median(samples)
        times((sfDir, name)) = m
        println(s"""{"sf":"$sfDir","query":"$name","sec":$m}""")
      }
      SessionCaches.release(spark)
    }
    // exponent from the two LARGEST SFs (least overhead-dominated pair),
    // vs the documents row ratio (the doc-side ops) — nominal ratio for
    // all tables here is the same SF ratio, so one ratio serves all
    val (lo, hi) = (sfDirs(sfDirs.length - 2), sfDirs.last)
    val ratio = rows(hi)("documents").toDouble / rows(lo)("documents")
    val perQ = names.map { n =>
      val (tl, th) = (times((lo, n)), times((hi, n)))
      val exp = if (tl > 0 && th > 0) math.log(th / tl) / math.log(ratio)
        else Double.NaN
      n -> ((sfDirs.map(d => times((d, n))), exp))
    }
    val qs = perQ.map { case (n, (ts, e)) =>
      val tsJs = ts.map(t => f"$t%.3f").mkString("[", ",", "]")
      val eJs = if (e.isNaN) "null" else f"$e%.3f"
      s""""$n":{"sec":$tsJs,"exponent":$eJs}"""
    }.mkString("{", ",", "}")
    val rowsJs = sfDirs.map { d =>
      s""""$d":{${rows(d).map { case (k, v) => s""""$k":$v""" }.mkString(",")}}"""
    }.mkString("{", ",", "}")
    val line = s"""{"metric":"scaling","reps":$reps,"pre_run_load_1m":$loadAvg,"input_ratio":$ratio,"sf_dirs":${sfDirs.map("\"" + _ + "\"").mkString("[", ",", "]")},"rows":$rowsJs,"queries":$qs}"""
    println(line)
    try java.nio.file.Files.write(java.nio.file.Paths.get("SCALING_LOCAL.json"),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"SCALING write failed: $e") }
    spark.stop()
  }
}
