package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: JVM/codegen/parquet-footer costs land here, not on the first
    // timed query; pinned to q01 so the warmup is deterministic run-to-run.
    // Plain counts also touch the other tables' footers/scan pipelines so
    // first-touch I/O noise doesn't land on whichever doc/embedding query
    // sorts first — their real work (shingles, signatures…) stays timed.
    try {
      SparkEntry.queries("q01_agg")(spark, sfDir).count()
      val t = Tables(spark, sfDir)
      t.documents.count(); t.embeddings.count(); t.events.count()
    } catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable => System.err.println(s"BENCH FAIL $name: $e"); false
      }
      // a failed query records -1 so it can never read as a fast success
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    // lifecycle-own the session caches the dedup/ANN paths registered
    graft.dedup.Dedup.releaseShingles(spark)
    graft.similarity.Knn.clearIvfModels(spark)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    // any failure poisons the headline value (-1): a breakage can never
    // read as a speedup to a consumer of "value" alone
    val total = if (failed.nonEmpty) -1.0 else results.map(_._2).sum
    // split headline (SURVEY §8.3): d02/d05 are *declared* exact oracle
    // baselines users must never run at scale — report the production-path
    // total separately so round-over-round tracking isn't dominated by them
    val baselineQs = Set("d02_ngram_jaccard", "d05_embedding_dup")
    val baseline = if (failed.nonEmpty) -1.0
      else results.collect { case (k, v) if baselineQs(k) => v }.sum
    val production = if (failed.nonEmpty) -1.0 else total - baseline
    val failedJs = failed.mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","production_sec":$production,"baseline_sec":$baseline,"failed":$failedJs,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
