package graft

import org.apache.spark.sql.SparkSession

/** Measured scaling evidence: run a family-covering query subset at every
  * available scale factor and fit the per-query scaling exponent between
  * the two largest SFs (time ratio over a 10× input ratio, log base 10).
  *
  * Why this exists: the 100 TB claims in SURVEY §8.4 are plan-shape
  * arguments (partial aggregation bounds the exchange, banding bounds the
  * candidate set, serve cost is corpus-free). This harness turns the
  * claims into numbers, read as CONTRASTS between a declared-quadratic
  * baseline and its shipped scale route over the same input growth:
  * d05's exact all-pairs vs d06's IVF-bucketed near-dup, s01's q×n brute
  * force vs s02's served IVF. The baseline's exponent must exceed its
  * scale route's by a wide margin or the harness isn't measuring anything.
  *
  * Reading the exponents at local[32] sizes: per-job fixed overhead
  * (~0.1-0.4 s/job, measured by Bench's calibration probes) flattens
  * small-SF times, so every exponent UNDERSTATES the asymptotic slope —
  * they are lower bounds, and even the quadratic controls can read
  * sub-linear while the pair term still sits under the overhead floor
  * (at 2,000 embeddings d05's 4M cosine pairs cost well under one
  * second of SIMD). The signal is ordinal: scan-shaped operators pin
  * near 0–0.2, the quadratic baselines read several times higher and
  * keep RISING with SF while their scale-route contrasts stay flat.
  * Exponents are computed from the largest SF pair only, where data
  * cost most exceeds overhead.
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
    * contrast to d05, d06/s02 as the corpus-free serve contrasts).
    * Each query is tagged with the table whose growth drives its cost, so
    * the exponent divides by THAT table's measured row ratio — the
    * testdata generations do NOT scale every table uniformly with SF
    * (e.g. embeddings grew 4× over a decade of SF while lineitem grew
    * 10×), and a nominal-SF exponent would silently understate the
    * embedding queries. */
  val subset: Seq[(String, String)] = Seq(
    "q01_agg" -> "lineitem", "q03_join_agg" -> "lineitem",
    "q08_window_rank" -> "lineitem", "q10_topk" -> "lineitem",
    "d01_dedup_exact" -> "documents", "d03_minhash_lsh" -> "documents",
    "d05_embedding_dup" -> "embeddings",
    "d06_embedding_dup_ivf" -> "embeddings",
    "s01_knn_brute" -> "embeddings", "s02_knn_ivf" -> "embeddings",
    "x_d06_ivf_pairs" -> "embeddings", "x_s02_ivf_serve" -> "embeddings",
    "t03_quality" -> "documents", "t08_bpe_encode" -> "documents",
    "p02_decontaminate" -> "documents", "p05_pack_sequences" -> "documents",
    "p21_shard_manifest" -> "documents", "p57_chunk_windows" -> "documents")

  /** Scaling-only probes (`x_` prefix — not part of the correctness
    * surface): the round-14 promotions re-registered s02/d06 as
    * exact-parity frames (corpus-LINEAR assignment checks), so the
    * quadratic-baseline-vs-scale-route CONTRAST — d05's all-pairs vs the
    * IVF-bucketed pair generator, s01's q×n vs the served IVF top-k —
    * keeps being measured here against the same serve functions the
    * routed operators (d38/s32) dispatch to. */
  val direct: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
    "x_s02_ivf_serve" -> ((s, d) =>
      graft.similarity.Knn.ivf(Tables(s, d).embeddings)),
    "x_d06_ivf_pairs" -> ((s, d) =>
      graft.dedup.Dedup.embeddingDupPairsIvf(Tables(s, d).embeddings)))

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
        subset.filter(p => keep(p._1))
      case None => subset.filter(p =>
        SparkEntry.queries.contains(p._1) || direct.contains(p._1))
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
      for ((name, _) <- names) {
        val samples = (1 to reps).map { _ =>
          SessionCaches.release(spark)
          val t0 = System.nanoTime()
          val ok = try {
            SparkEntry.queries.getOrElse(name, direct(name))(spark, sfDir)
              .count(); true }
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
    // each query against ITS driving table's measured row growth; with a
    // single sf-dir there is no pair — times are still reported, the fit
    // is null (previously this indexed sfDirs(-1) and lost the whole run)
    val perQ = if (sfDirs.length < 2) {
      names.map { case (n, tbl) =>
        n -> ((sfDirs.map(d => times((d, n))), Double.NaN, tbl, 1.0))
      }
    } else {
      val (lo, hi) = (sfDirs(sfDirs.length - 2), sfDirs.last)
      names.map { case (n, tbl) =>
        val ratio = rows(hi)(tbl).toDouble / rows(lo)(tbl)
        val (tl, th) = (times((lo, n)), times((hi, n)))
        val exp = if (tl > 0 && th > 0 && ratio > 1)
          math.log(th / tl) / math.log(ratio) else Double.NaN
        n -> ((sfDirs.map(d => times((d, n))), exp, tbl, ratio))
      }
    }
    val qs = perQ.map { case (n, (ts, e, tbl, ratio)) =>
      val tsJs = ts.map(t => f"$t%.3f").mkString("[", ",", "]")
      val eJs = if (e.isNaN) "null" else f"$e%.3f"
      s""""$n":{"sec":$tsJs,"exponent":$eJs,"table":"$tbl","input_ratio":$ratio}"""
    }.mkString("{", ",", "}")
    val rowsJs = sfDirs.map { d =>
      s""""$d":{${rows(d).map { case (k, v) => s""""$k":$v""" }.mkString(",")}}"""
    }.mkString("{", ",", "}")
    // anchor: the d05-vs-d06 contrast at a size where the pair term
    // clearly dominates overhead (N² pairs ≈ 1000× the sf0.1 testdata's),
    // on a DETERMINISTIC synthetic frame (hash-derived coordinates — no
    // RNG, so the run is reproducible bit-for-bit). One rep: at this size
    // the signal is minutes-vs-seconds, not tenths.
    val anchorN = sys.env.getOrElse("SPARK_GRAFT_ANCHOR_N", "12000").toInt
    val anchorJs = if (anchorN <= 0) "null" else {
      val emb = spark.range(0L, anchorN.toLong, 1L, 32)
        .selectExpr("id as vec_id",
          """transform(sequence(1, 16), j ->
            | cast(pmod(xxhash64(id * 31 + j), 1000) / 1000.0 - 0.5 as float)
            |) as embedding""".stripMargin)
      def time(f: => Long): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      SessionCaches.release(spark)
      val tExact = time(graft.dedup.Dedup.embeddingDupPairs(emb).count())
      SessionCaches.release(spark)
      // cells scale with the corpus (the d06 scaladoc's own prescription:
      // cells ∝ corpus keeps per-cell work bounded) — 64 cells at 12k
      // vectors ≈ the sf0.1 cell density
      val tIvf = time(
        graft.dedup.Dedup.embeddingDupPairsIvf(emb, nCells = 64).count())
      SessionCaches.release(spark)
      s"""{"n":$anchorN,"d05_exact_sec":${f"$tExact%.3f"},"d06_ivf_sec":${f"$tIvf%.3f"},"ivf_cells":64}"""
    }
    val line = s"""{"metric":"scaling","reps":$reps,"pre_run_load_1m":$loadAvg,"sf_dirs":${sfDirs.map("\"" + _ + "\"").mkString("[", ",", "]")},"rows":$rowsJs,"anchor":$anchorJs,"queries":$qs}"""
    println(line)
    try java.nio.file.Files.write(java.nio.file.Paths.get("SCALING_LOCAL.json"),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"SCALING write failed: $e") }
    spark.stop()
  }
}
