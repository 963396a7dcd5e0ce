package graft.tools

import graft.GraftSession

/** Print the final (post-AQE) executed plan of a named query, plus shuffle
  * and join counts — the quickest way to audit a query's scale shape.
  * Usage: ExplainQ <sfDir> <queryName> [queryName...]
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      println(s"==== $name")
      println("  Exchange hashpartitioning: " + "Exchange hashpartitioning".r.findAllIn(p).size)
      println("  BroadcastExchange:         " + "BroadcastExchange".r.findAllIn(p).size)
      println("  SortMergeJoin:             " + "SortMergeJoin".r.findAllIn(p).size)
      println(p)
    }
    spark.stop()
  }
}
