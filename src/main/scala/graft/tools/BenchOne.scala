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
    args.drop(1).foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"$name%s n=$n%d ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
