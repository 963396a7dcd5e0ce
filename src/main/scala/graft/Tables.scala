package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog over the test-data star schema.
  *
  * Mirrors the reference's input model — a named list of files mapped to a
  * local alias (`common/.../InputInfo.java:16-67`, CLI `hdfsPath#alias`,
  * `AM/ApplicationMaster.java:841-845`) — as Spark temp views: the alias is
  * the view name, the file list is whatever the glob expands to.
  *
  * Scans are plain `spark.read.parquet`, so Catalyst predicate pushdown and
  * column pruning reach the parquet reader for free; at 100 TB the same code
  * reads a partitioned directory tree with partition pruning.
  */
final case class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame =
    // memoized per (session, dir, name): constructing the relation reads
    // parquet footers for schema, and every query call builds a fresh
    // Tables — without the memo each invocation re-pays footer I/O per
    // table touched (and registerViews pays it ×10). The cached object is
    // an immutable logical plan; Tables.invalidate drops it if the files
    // under `dir` are rewritten mid-session. SessionCaches reclaims the
    // entries when the session's application ends.
    Tables.relCache.getOrElseUpdate(spark, (dir, name))(load(name))

  private def load(name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts has shipped in two physical forms across testdata
    // generations; normalize both to session-zoned TIMESTAMP (micros):
    //   - parquet TIMESTAMP(NANOS): read as long nanos
    //     (spark.sql.legacy.parquet.nanosAsLong=true) and floor to micros —
    //     floor, not DIV (truncate-toward-zero), so pre-1970 nanos round the
    //     same way DuckDB's micro-precision TIMESTAMP read does.
    //     Integer-exact: pmod(ts,1000) is the non-negative remainder, so the
    //     subtraction lands on the floor multiple.
    //   - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): inferred as
    //     TIMESTAMP_NTZ; the session TZ is pinned to UTC (GraftSession), so
    //     the cast to TimestampType is value-identical and keeps every
    //     downstream query's type expectations unchanged.
    if (name == "events") {
      import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      df.schema("ts").dataType match {
        case LongType =>
          df.withColumn("ts", timestamp_micros(expr("(ts - pmod(ts, 1000)) DIV 1000")))
        case TimestampNTZType =>
          df.withColumn("ts", col("ts").cast(TimestampType))
        case _ => df
      }
    } else df
  }

  def region: DataFrame     = table("region")
  def nation: DataFrame     = table("nation")
  def customer: DataFrame   = table("customer")
  def supplier: DataFrame   = table("supplier")
  def part: DataFrame       = table("part")
  def orders: DataFrame     = table("orders")
  def lineitem: DataFrame   = table("lineitem")
  def events: DataFrame     = table("events")
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")

  /** Register every table as a temp view (alias → files, like the reference's
    * `hdfsGlob#alias`). Enables the `spark.sql(...)` surface. Idempotent per
    * (session, dir): re-registration is skipped unless the session's views
    * currently point at a different dir. */
  def registerViews(): Unit =
    if (!Tables.lastViews.put(spark, (), dir).contains(dir))
      Tables.names.foreach(n => table(n).createOrReplaceTempView(n))
}

object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private val relCache = new SessionKeyedCache[(String, String), DataFrame]()
  private val lastViews = new SessionKeyedCache[Unit, String]()

  /** Drop memoized relations/views for `spark` (e.g. after rewriting the
    * files under a dir this session already read). */
  def invalidate(spark: SparkSession): Unit = {
    relCache.purgeSession(Some(spark), None)
    lastViews.purgeSession(Some(spark), None)
  }
}
