package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for every suite (forked test JVM). */
object SparkTestSession {
  lazy val spark: SparkSession = GraftSession.local(8)
  val sf: String = "/root/testdata/sf0.001"
  lazy val tables: Tables = Tables(spark, sf)
}
