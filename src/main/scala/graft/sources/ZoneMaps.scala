package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import org.apache.spark.internal.Logging

import graft.SessionKeyedCache

/** Zone maps: file-grain min/max statistics + manifest-pruned scans — the
  * file-skipping layer every lakehouse table format (Delta, Iceberg, Hudi —
  * all public designs) puts between the catalog and the scan, expressed
  * over plain parquet directories.
  *
  * Why this is an engine feature and not a query: Spark prunes at two
  * grains for free — directory partitions (partition pruning) and row
  * groups (parquet min/max, evaluated AFTER the footer is opened). Between
  * them sits the grain that dominates at 100 TB: which of the table's
  * ~10⁵–10⁶ FILES to list, open, and schedule at all. The reference's scan
  * path enumerates every input split and deals all of them to workers
  * (`AM/ApplicationMaster.java:882-903`); a zone-map manifest is the
  * statistics layer that lets that enumeration skip — a file whose
  * [min, max] envelope misses the predicate never costs a footer read, a
  * scheduler round-trip, or a task slot.
  *
  * The three pieces:
  *   - [[clusteredWrite]]: range-repartition + in-file sort on the zone
  *     column. Zone maps are only as tight as the layout; a randomly
  *     laid-out table has every file spanning the whole domain and prunes
  *     nothing. Range clustering makes file envelopes DISJOINT (up to
  *     boundary ties), so a point/range predicate overlaps O(selectivity ·
  *     nFiles) envelopes — the write-side half of the contract.
  *   - [[build]]: ONE distributed scan → one manifest row per file
  *     (`input_file_name()` group keys; partial aggregation bounds the
  *     exchange to #files rows). In production the manifest is a durable
  *     table maintained per ingest batch (the p21 shard-manifest
  *     discipline); here it is session-memoized, built at most once per
  *     (session, directory).
  *   - [[pruneFiles]] / [[prunedRead]]: driver-side envelope filter over
  *     the manifest rows (bounded by #files — the same object a table
  *     format's metadata layer holds on the driver), then a scan of ONLY
  *     the surviving files with the predicate re-applied as a residual
  *     (zone maps prune at file grain; the residual keeps row-level
  *     exactness regardless of envelope looseness).
  *
  * Null discipline: min/max ignore NULLs, so an all-NULL file carries a
  * NULL envelope and is dropped by the overlap test — correct, because a
  * range predicate on the zone column is null-rejecting. A file mixing
  * NULLs with values keeps its value envelope; NULL rows in surviving
  * files are removed by the residual filter.
  */
object ZoneMaps extends Logging {

  /** Range-cluster `df` by `colName` into exactly `nFiles` parquet files
    * under `dir`. `repartitionByRange` samples boundaries deterministically
    * (seeded per-partition sketch), and the within-file sort keeps row
    * groups internally tight too — so parquet's own row-group stats compose
    * with the file-grain manifest. */
  def clusteredWrite(df: DataFrame, colName: String, dir: String,
                     nFiles: Int): Unit =
    df.repartitionByRange(nFiles, col(colName))
      .sortWithinPartitions(colName)
      .write.mode("overwrite").parquet(dir)

  /** Z-order-lite two-column clustering — ONE layout that serves range
    * predicates on EITHER column (the Delta/Iceberg Z-ORDER pitch, public
    * design): each column is linearly scaled to a 16-bit bucket id off its
    * global [min, max] (one 1-row aggregate), the two ids are
    * bit-INTERLEAVED into the Morton value, and files are range-clustered
    * by that value. Locality in Z-space bounds each file's envelope in
    * BOTH dimensions to ~√nFiles of the domain, so either column's zone
    * map prunes ~√nFiles-fold — where single-column clustering leaves the
    * other column's envelopes spanning the full domain (pruning nothing,
    * spec-contrasted). Linear scaling under skew costs only pruning
    * EFFECTIVENESS, never correctness: the manifest always carries the
    * files' exact min/max. Columns must be integral or timestamp (scaled
    * in exact micros). The interleave is a pure Column expression tree —
    * codegen'd, no UDF, computed once at write time. */
  def clusteredWriteZ(df: DataFrame, colA: String, colB: String,
                      dir: String, nFiles: Int): Unit = {
    def asLong(c: String): Column = df.schema(c).dataType match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(col(c).cast("timestamp"))
      case _ => col(c).cast("long")
    }
    val mm = df.agg(min(asLong(colA)), max(asLong(colA)),
      min(asLong(colB)), max(asLong(colB))).head()
    require(!mm.isNullAt(0) && !mm.isNullAt(2),
      "clusteredWriteZ: both columns need at least one non-null value")
    def bucket(v: Column, lo: Long, hi: Long): Column = {
      val span = math.max(hi - lo, 1L)
      // double scaling is exact below 2^53 and only affects effectiveness
      least(lit(65535L),
        ((v - lit(lo)).cast("double") / lit(span.toDouble) * 65535.0)
          .cast("long"))
    }
    val a = bucket(asLong(colA), mm.getLong(0), mm.getLong(1))
    val b = bucket(asLong(colB), mm.getLong(2), mm.getLong(3))
    // Morton interleave: a's bit i → 2i+1, b's bit i → 2i (16 bits each)
    val z = (0 until 16).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_.bitwiseOR(_))
    df.withColumn("_gzm_z", coalesce(z, lit(-1L)))
      .repartitionByRange(nFiles, col("_gzm_z"))
      .sortWithinPartitions("_gzm_z")
      .drop("_gzm_z")
      .write.mode("overwrite").parquet(dir)
  }

  /** The manifest as a DataFrame: one row per file with its row count and,
    * per tracked column, `<c>_min` / `<c>_max` / `<c>_nulls`. One scan,
    * reading only the tracked columns (column pruning reaches the parquet
    * reader — the group key is the file name the scan already knows). */
  def build(spark: SparkSession, dir: String, cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"))
    }
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  private val manifestCache = new SessionKeyedCache[(String, Seq[String]), Array[Row]]()

  /** Collected manifest rows, built at most once per (session, dir, cols).
    * Driver-resident by design: #files rows is what Delta/Iceberg hold in
    * their metadata layer too — at 10⁶ files this is megabytes, and it is
    * consulted by every query where the data scan it replaces is terabytes. */
  def manifestRows(spark: SparkSession, dir: String,
                   cols: Seq[String]): Array[Row] =
    manifestCache.getOrElseUpdate(spark, (dir, cols))(
      build(spark, dir, cols).collect())

  /** Rebuild the manifest and REPLACE the session memo — the step after
    * any rewrite of `dir` (a re-clustering, a compaction): the memoized
    * rows name the old files, and a stale manifest prunes to paths that
    * no longer exist. [[graft.GraftSession.prepareTable]] calls this, so
    * re-running the ingest recipe in one session stays consistent. Also
    * seeds the per-column subset keys (a manifest over (a, b) carries
    * a's and b's envelopes, so single-column prunes hit the memo too). */
  def refreshManifest(spark: SparkSession, dir: String,
                      cols: Seq[String]): Array[Row] = {
    val rows = build(spark, dir, cols).collect()
    seed(spark, dir, cols, rows)
    rows
  }

  private def seed(spark: SparkSession, dir: String, cols: Seq[String],
                   rows: Array[Row]): Unit = {
    manifestCache.put(spark, (dir, cols), rows)
    cols.foreach(c => manifestCache.put(spark, (dir, Seq(c)), rows))
  }

  /** Timestamp externals differ by parquet physical type across testdata
    * generations (TIMESTAMP_NTZ collects as LocalDateTime, adjusted-to-UTC
    * as java.sql.Timestamp); normalize the instant form to its UTC wall
    * time (the session TZ is pinned UTC) so either generation compares
    * against TZ-free LocalDateTime bounds. */
  private def key(a: Any): Any = a match {
    case t: java.sql.Timestamp =>
      t.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDateTime
    case x => x
  }

  private def cmp(a: Any, b: Any): Int =
    key(a).asInstanceOf[Comparable[Any]].compareTo(key(b))

  /** Files whose [min, max] envelope overlaps the predicate interval
    * [lo, hi) — inclusive lower, exclusive upper, the natural shape for
    * date/timestamp ranges ([lo, hi] with `hiInclusive`, the natural shape
    * for key ranges). NULL envelopes (all-NULL files) never overlap. */
  def pruneFiles(manifest: Array[Row], colName: String,
                 lo: Any, hi: Any, hiInclusive: Boolean = false): Array[String] =
    manifest.filter { r =>
      val mn = r.getAs[Any](s"${colName}_min")
      val mx = r.getAs[Any](s"${colName}_max")
      mn != null && mx != null && cmp(mx, lo) >= 0 &&
        (if (hiInclusive) cmp(mn, hi) <= 0 else cmp(mn, hi) < 0)
    }.map(_.getAs[String]("file"))

  /** Manifest-pruned scan of `dir` for `zoneCol` ∈ [lo, hi): reads ONLY the
    * overlapping files (skipped files cost nothing — no footer, no task),
    * then re-applies the predicate as a residual filter. `loCol`/`hiCol`
    * are the same bounds as Catalyst literals (callers pass both forms so
    * no engine-side conversion can disagree with the driver-side one).
    * An empty survivor set returns the empty frame through a footer-only
    * schema read with a false predicate — zero data rows scanned. */
  def prunedRead(spark: SparkSession, dir: String, zoneCol: String,
                 lo: Any, hi: Any, loCol: Column, hiCol: Column): DataFrame = {
    val manifest = manifestRows(spark, dir, Seq(zoneCol))
    val files = pruneFiles(manifest, zoneCol, lo, hi)
    // the ScanWindowWatch discipline: degradation is observable, not
    // silent — but only blame the layout when the predicate is a STRICT
    // subinterval of the data's domain (a full-history range keeping
    // every file is the correct answer, not degeneracy)
    if (files.length == manifest.length && manifest.length > 1) {
      val mins = manifest.map(_.getAs[Any](s"${zoneCol}_min")).filter(_ != null)
      val maxs = manifest.map(_.getAs[Any](s"${zoneCol}_max")).filter(_ != null)
      val strictSub = mins.nonEmpty &&
        (cmp(lo, mins.min(Ordering.fromLessThan[Any](cmp(_, _) < 0))) > 0 ||
         cmp(hi, maxs.max(Ordering.fromLessThan[Any](cmp(_, _) < 0))) <= 0)
      if (strictSub)
        logWarning(s"zone-map prune on '$zoneCol' kept every file of $dir " +
          s"(${manifest.length}) for a strict subrange — the layout does " +
          "not separate this column; cluster by it (clusteredWrite) or " +
          "add it to a clusteredWriteZ pair")
    }
    if (files.isEmpty) spark.read.parquet(dir).where(lit(false))
    else {
      val df = spark.read.parquet(files.toIndexedSeq: _*)
      // cast the bounds to the column's own type (TIMESTAMP vs NTZ differs
      // by testdata generation; under the pinned-UTC session the cast is
      // value-identical either way)
      val dt = df.schema(zoneCol).dataType
      df.where(col(zoneCol) >= loCol.cast(dt) && col(zoneCol) < hiCol.cast(dt))
    }
  }

  /** Persist the manifest as a parquet table — the durable form the
    * production story uses (build once per ingest, read per query session,
    * maintain with [[incrementalBuild]] + rewrite). One tiny write:
    * #files rows. */
  def writeManifest(spark: SparkSession, dir: String, cols: Seq[String],
                    manifestPath: String): Unit =
    build(spark, dir, cols).coalesce(1)
      .write.mode("overwrite").parquet(manifestPath)

  /** Load a persisted manifest into the session memo so every
    * [[prunedRead]]/[[joinPrunedRead]] over `dir` consults it without
    * re-scanning the data — the session-open step a query service runs.
    * Seeds the per-column subset keys too: prunedRead looks up
    * (dir, Seq(zoneCol)), and a multi-column manifest row carries every
    * tracked column's envelope. */
  def loadManifest(spark: SparkSession, dir: String, cols: Seq[String],
                   manifestPath: String): Array[Row] = {
    val rows = spark.read.parquet(manifestPath).collect()
    seed(spark, dir, cols, rows)
    rows
  }

  /** Join-driven file pruning — dynamic partition pruning at the FILE
    * grain: bound the dim side's join-key domain with one tiny aggregate
    * (a 1-row job over the already-filtered dim), prune the fact's files
    * to the envelopes overlapping [min, max], and return the pruned fact
    * scan for the caller's join — the join's own equality removes any
    * envelope-loose rows, so no residual is needed and correctness never
    * depends on envelope tightness. Effective exactly when the fact is
    * CLUSTERED by the join key and the dim's surviving key range is
    * narrow (time-correlated ingest keys, the common star-join case) —
    * the same contract as Spark's own DPP one level down: DPP skips
    * unmatched PARTITIONS after listing; this skips unmatched FILES
    * before any footer is opened. An empty dim prunes everything (the
    * empty-join fast path, zero fact rows scanned). */
  def joinPrunedRead(spark: SparkSession, factDir: String, zoneCol: String,
                     dimKeys: DataFrame, dimKeyCol: String): DataFrame = {
    val r = dimKeys.agg(min(col(dimKeyCol)), max(col(dimKeyCol))).head()
    if (r.isNullAt(0)) spark.read.parquet(factDir).where(lit(false))
    else {
      val files = pruneFiles(manifestRows(spark, factDir, Seq(zoneCol)),
        zoneCol, r.get(0), r.get(1), hiInclusive = true)
      if (files.isEmpty) spark.read.parquet(factDir).where(lit(false))
      else spark.read.parquet(files.toIndexedSeq: _*)
    }
  }

  /** Batch-incremental manifest maintenance — the p58 census discipline at
    * the file grain: scan ONLY files the standing manifest has not seen
    * (cost ∝ the ingest batch, never the standing 100 TB), drop rows for
    * files that vanished (compaction/retention), keep the rest verbatim.
    * Per-file stats never change after the file is written (parquet files
    * are immutable), so the merge is row union — the maintained manifest
    * equals a from-scratch [[build]] exactly (spec-pinned). */
  def incrementalBuild(spark: SparkSession, dir: String, cols: Seq[String],
                       standing: Array[Row]): Array[Row] = {
    def norm(f: String): String = java.net.URI.create(f).getPath
    // ONE listing serves both sides — at 10⁵–10⁶ files the listing is the
    // dominant metadata cost of the maintenance call
    val listing = spark.read.parquet(dir).inputFiles
    val current = listing.map(norm).toSet
    val kept = standing.filter(r => current(norm(r.getAs[String]("file"))))
    val known = standing.map(r => norm(r.getAs[String]("file"))).toSet
    val fresh = listing.filterNot(f => known(norm(f)))
    if (fresh.isEmpty) kept
    else {
      val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
        Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"))
      }
      kept ++ spark.read.parquet(fresh.toIndexedSeq: _*)
        .groupBy(input_file_name().as("file"))
        .agg(aggs.head, aggs.tail: _*)
        .collect()
    }
  }

  // ---- q133: the registered end-to-end proof ------------------------------

  private val clusteredCache = new SessionKeyedCache[String, String]()
  private[graft] val demoFiles = 8

  /** A range-clustered lineitem copy (by l_shipdate, [[demoFiles]] files)
    * under a fresh per-session temp directory — written at most once per
    * (session, source dir), the ingest-side step a production table does
    * once per batch. A fresh temp dir per session (never a fixed path)
    * keeps the memoized manifest and the files on disk consistent by
    * construction. */
  private def clusteredLineitem(spark: SparkSession, dir: String): String =
    clusteredCache.getOrElseUpdate(spark, dir) {
      val out = Files.createTempDirectory("graft_zonemap_").toString
      clusteredWrite(graft.Tables(spark, dir).lineitem, "l_shipdate", out, demoFiles)
      out
    }

  /** A lineitem copy key-clustered by l_orderkey (for the join-pruning
    * proof), memoized like [[clusteredLineitem]]. */
  private def clusteredLineitemByKey(spark: SparkSession, dir: String): String =
    clusteredCache.getOrElseUpdate(spark, s"$dir#bykey") {
      val out = Files.createTempDirectory("graft_zonemap_k_").toString
      clusteredWrite(graft.Tables(spark, dir).lineitem, "l_orderkey", out, demoFiles)
      out
    }

  /** q134: join-driven file pruning, end to end — the dim side is the
    * lowest eighth of the orderkey domain (the time-correlated-ingest
    * shape: recent keys, narrow span); [[joinPrunedRead]] bounds it with
    * one 1-row aggregate and scans only the overlapping files of the
    * key-clustered fact. The oracle joins the UNPRUNED table, so a wrong
    * skip loses rows and hash-fails; `pruned` pins that files were really
    * skipped (a ~12 % key slice cannot overlap all 8 disjoint range
    * files). The join equality is the residual — no envelope tightness
    * assumption anywhere. */
  def q134ZoneMapJoin(spark: SparkSession, dir: String): DataFrame = {
    val cdir = clusteredLineitemByKey(spark, dir)
    val orders = graft.Tables(spark, dir).orders
    val b = orders.agg(min(col("o_orderkey")).as("lo"),
      max(col("o_orderkey")).as("hi")).head()
    val cut = b.getLong(0) + (b.getLong(1) - b.getLong(0)) / 8
    val dim = orders.where(col("o_orderkey") <= cut)
      .select(col("o_orderkey"), col("o_orderdate"))
    val fact = joinPrunedRead(spark, cdir, "l_orderkey", dim, "o_orderkey")
    val total = manifestRows(spark, cdir, Seq("l_orderkey")).length
    val scanned = fact.inputFiles.length
    fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate").cast("date")).as("yr"))
      .agg(count(lit(1)).as("n_rows"),
        (round(sum(col("l_quantity")), 4) + lit(0.0)).as("sum_qty"))
      .withColumn("files_total", lit(total))
      .withColumn("pruned", lit(scanned < total))
  }

  /** q133: zone-map-pruned scan, end to end — cluster lineitem by ship
    * date, build the file manifest, prune to the files overlapping
    * calendar-1996, and aggregate the survivors. The oracle recomputes the
    * aggregate from the UNPRUNED table, so a manifest that drops a needed
    * file (or keeps rows outside the range) hash-fails; `pruned` pins that
    * the scan really skipped files (a year is ~15 % of the 1995–2001 span,
    * so ≥1 of the 8 disjoint range files must miss the envelope test), and
    * `files_total` pins the clustered layout. */
  def q133ZoneMapPrune(spark: SparkSession, dir: String): DataFrame = {
    val cdir = clusteredLineitem(spark, dir)
    val lo = java.time.LocalDateTime.parse("1996-01-01T00:00:00")
    val hi = java.time.LocalDateTime.parse("1997-01-01T00:00:00")
    val loCol = lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    val hiCol = lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    val total = manifestRows(spark, cdir, Seq("l_shipdate")).length
    val scanned = pruneFiles(manifestRows(spark, cdir, Seq("l_shipdate")),
      "l_shipdate", lo, hi).length
    prunedRead(spark, cdir, "l_shipdate", lo, hi, loCol, hiCol)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        (round(sum(col("l_quantity")), 4) + lit(0.0)).as("sum_qty"))
      .withColumn("files_total", lit(total))
      .withColumn("pruned", lit(scanned < total))
  }
}
