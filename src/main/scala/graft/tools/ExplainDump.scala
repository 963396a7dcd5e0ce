package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.GraftSession

/** Write `.explain("formatted")` for named queries to files — the
  * plan-evidence artifact the optimization rounds commit
  * (`plans/r15/<query>_<tag>.txt`). Usage:
  *   ExplainDump <sfDir> <outDir> <tag> <queryName> [queryName...]
  * Pass `all` as the single query name to dump every registered query.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val tag = args(2)
    val names =
      if (args.length == 4 && args(3) == "all") graft.SparkEntry.queries.keys.toSeq.sorted
      else args.drop(3).toSeq
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    // optional session conf overrides ("k=v;k=v") — lets a plan dump show a
    // size-routed operator's ABOVE-threshold shape (e.g. d17's candidate-
    // bounded df route) without synthesizing a big corpus
    sys.env.get("SPARK_GRAFT_EXPLAIN_CONF").foreach(_.split(";").foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.trim.nonEmpty => spark.conf.set(k.trim, v.trim)
        case _ => ()
      }
    })
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(Paths.get(outDir, s"${name}_$tag.txt"),
          formatted.getBytes(StandardCharsets.UTF_8))
        println(s"wrote $name")
      } catch { case e: Throwable => System.err.println(s"SKIP $name: $e") }
    }
    spark.stop()
  }
}
