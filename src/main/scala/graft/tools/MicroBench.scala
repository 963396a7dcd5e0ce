package graft.tools

import graft.GraftSession

/** Ad-hoc micro-benchmark: time one named query N times.
  * Usage: MicroBench <sfDir> <queryName> [reps]
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name  = args(1)
    val reps  = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val q = graft.SparkEntry.queries(name)
    // JVM/codegen warmup on an unrelated query so rep timings isolate the
    // target; clearCache between reps so each rep is a true cold run
    graft.SparkEntry.queries("q01_agg")(spark, sfDir).collect()
    (1 to reps).foreach { i =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = q(spark, sfDir).collect().length
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"rep$i%d $name%s rows=$n%d ${dt}%.3f s")
    }
    spark.stop()
  }
}
