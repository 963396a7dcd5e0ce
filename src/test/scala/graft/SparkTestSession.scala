package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for every suite (forked test JVM). */
object SparkTestSession {
  lazy val spark: SparkSession = GraftSession.local(8)
  val sf: String = "/root/testdata/sf0.001"
  lazy val tables: Tables = Tables(spark, sf)

  /** The FINAL adaptive plan as a string, with every `== Initial Plan ==`
    * section removed — including NESTED ones: a cached relation embeds its
    * own AdaptiveSparkPlan, so the old `split("== Initial Plan ==")(0)`
    * idiom truncated the OUTER final tree at the inner marker and plan-shape
    * assertions silently stopped seeing the subtree below it (e.g. the
    * broadcast side of a join). Sections are removed by indentation: a
    * marker at indent I owns every following line indented deeper than I. */
  def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    val lines = df.queryExecution.executedPlan.toString.split("\n", -1)
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    def indentOf(s: String): Int = s.indexWhere(!_.isWhitespace) match {
      case -1 => Int.MaxValue
      case i => i
    }
    var skipDeeperThan = -1 // not skipping
    for (line <- lines) {
      val marker = line.contains("== Initial Plan ==")
      val ind = indentOf(line)
      if (skipDeeperThan >= 0 && ind <= skipDeeperThan && !marker) skipDeeperThan = -1
      if (marker && (skipDeeperThan < 0 || ind <= skipDeeperThan)) skipDeeperThan = ind
      else if (skipDeeperThan < 0) out += line
    }
    out.mkString("\n")
  }
}
