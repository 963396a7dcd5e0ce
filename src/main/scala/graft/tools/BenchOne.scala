package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{GraftSession, SparkEntry}

/** Replicates graft.Bench's harness (session conf, warmup, count() action)
  * for an explicit list of queries — for isolating per-query regressions.
  * Usage: BenchOne <sfDir> <query> [query...]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup pinned to q01_agg, exactly as graft.Bench does (Map iteration
    // order is arbitrary — headOption would make the warmup nondeterministic)
    try SparkEntry.queries("q01_agg")(spark, sfDir).count()
    catch { case _: Throwable => () }
    // the _shared_* pseudo entries resolve exactly as in graft.Bench, so a
    // shared materialization can be timed (and warmed) in isolation here
    def run(name: String, s: SparkSession): Long = name match {
      case "_shared_shingles" => graft.dedup.Dedup.sharedShingles(graft.Tables(s, sfDir).documents).count()
      case "_shared_weighted_shingles" => graft.dedup.Dedup.sharedWeightedShingles(graft.Tables(s, sfDir).documents).count()
      case "_shared_shingle_arrays" => graft.dedup.Dedup.sharedShingleArraysFor(graft.Tables(s, sfDir).documents).count()
      case "_shared_weighted_arrays" => graft.dedup.Dedup.sharedWeightedArraysFor(graft.Tables(s, sfDir).documents).count()
      case "_shared_lsh_pairs" => graft.dedup.Dedup.minHashLshPairs(graft.Tables(s, sfDir).documents).count()
      case "_shared_cws_sig" => graft.dedup.Dedup.sharedCwsSignatures(graft.Tables(s, sfDir).documents).count()
      case "_shared_srp_pairs" => graft.similarity.Srp.srpPairs(graft.Tables(s, sfDir).embeddings).count()
      case "_shared_srp_probe" => graft.similarity.Srp.srpPairsMultiProbe(graft.Tables(s, sfDir).embeddings, nBands = 8, rowsPerBand = 8).count()
      case "_shared_jaccard_pairs" => graft.dedup.Dedup.sharedJaccardPairs(graft.Tables(s, sfDir).documents).count()
      case "_shared_edit_pairs" => graft.dedup.Dedup.sharedEditPairs(graft.Tables(s, sfDir).documents).count()
      case "_shared_tokens" => graft.operators.TextQueries.sharedTokens(graft.Tables(s, sfDir).documents).count()
      case n => SparkEntry.queries(n)(s, sfDir).count()
    }
    args.drop(1).foreach { name =>
      val t0 = System.nanoTime()
      val n = run(name, spark)
      println(f"$name%s n=$n%d ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
