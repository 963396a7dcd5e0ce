package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ZoneMaps

/** Zone-map contract: the clustered layout yields disjoint file envelopes,
  * the manifest is exact per file, pruning never changes results (for any
  * range, including empty and full), and it really skips files — asserted
  * on `inputFiles` of the pruned scan, not just the manifest count. */
class ZoneMapsSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val dir: String = {
    val out = Files.createTempDirectory("graft_zm_spec_").toString
    ZoneMaps.clusteredWrite(tables.lineitem, "l_shipdate", out, 6)
    out
  }
  private def manifest = ZoneMaps.manifestRows(spark, dir, Seq("l_shipdate"))

  private def ts(s: String) =
    java.time.LocalDateTime.parse(s.stripSuffix("Z"))
  private def tsCol(s: String) =
    lit(s.replace("T", " ").stripSuffix("Z")).cast("timestamp_ntz")

  test("manifest: one row per file, counts sum to the table, envelope exact") {
    val total = tables.lineitem.count()
    assert(manifest.length == 6)
    assert(manifest.map(_.getAs[Long]("n_rows")).sum == total)
    assert(manifest.map(_.getAs[String]("file")).distinct.length == 6)
    // spot-check two files: per-file min/max match a direct read
    manifest.take(2).foreach { r =>
      val one = spark.read.parquet(r.getAs[String]("file"))
        .agg(min(col("l_shipdate")), max(col("l_shipdate")), count(lit(1)))
        .head()
      assert(one.get(0) == r.getAs[Any]("l_shipdate_min"))
      assert(one.get(1) == r.getAs[Any]("l_shipdate_max"))
      assert(one.getLong(2) == r.getAs[Long]("n_rows"))
    }
  }

  test("clusteredWrite: file envelopes are disjoint up to boundary ties") {
    val sorted = manifest
      .map(r => (r.getAs[java.time.LocalDateTime]("l_shipdate_min"),
        r.getAs[java.time.LocalDateTime]("l_shipdate_max")))
      .sortWith((a, b) => a._1.isBefore(b._1))
    sorted.toSeq.sliding(2).foreach {
      case Seq((_, prevMax), (nextMin, _)) =>
        assert(!prevMax.isAfter(nextMin),
          s"overlapping envelopes: $prevMax > $nextMin")
      case _ =>
    }
  }

  test("pruned read ≡ full-scan filter for narrow, empty and full ranges") {
    val ranges = Seq(
      ("1996-01-01T00:00:00Z", "1997-01-01T00:00:00Z"), // interior year
      ("1990-01-01T00:00:00Z", "1991-01-01T00:00:00Z"), // fully before: empty
      ("1990-01-01T00:00:00Z", "2030-01-01T00:00:00Z"), // covers everything
      ("2001-10-01T00:00:00Z", "2030-01-01T00:00:00Z")) // tail sliver
    for ((lo, hi) <- ranges) {
      val pruned = ZoneMaps.prunedRead(spark, dir, "l_shipdate",
        ts(lo), ts(hi), tsCol(lo), tsCol(hi))
      val want = spark.read.parquet(dir)
        .where(col("l_shipdate") >= tsCol(lo) && col("l_shipdate") < tsCol(hi))
      assert(pruned.count() == want.count(), s"count drift for [$lo,$hi)")
      assert(pruned.exceptAll(want).isEmpty && want.exceptAll(pruned).isEmpty,
        s"row drift for [$lo,$hi)")
    }
  }

  test("pruning really skips files — narrow range scans a strict subset") {
    val pruned = ZoneMaps.prunedRead(spark, dir, "l_shipdate",
      ts("1996-01-01T00:00:00Z"), ts("1997-01-01T00:00:00Z"),
      tsCol("1996-01-01 00:00:00"), tsCol("1997-01-01 00:00:00"))
    val scanned = pruned.inputFiles.length
    assert(scanned > 0 && scanned < 6,
      s"expected a strict file subset for a ~1/7th range, scanned $scanned/6")
    // empty range: zero files scheduled (footer-only schema read)
    val none = ZoneMaps.pruneFiles(manifest, "l_shipdate",
      ts("1990-01-01T00:00:00Z"), ts("1991-01-01T00:00:00Z"))
    assert(none.isEmpty)
  }

  test("joinPrunedRead: key-clustered fact prunes by the dim's key range (long column)") {
    // also exercises the non-timestamp manifest path: a LONG zone column
    val d3 = Files.createTempDirectory("graft_zm_join_").toString
    ZoneMaps.clusteredWrite(tables.lineitem, "l_orderkey", d3, 6)
    // dim: a narrow orderkey slice (the time-correlated-ingest shape)
    val keys = tables.orders.select(col("o_orderkey"))
    val loHi = keys.agg(min(col("o_orderkey")), max(col("o_orderkey"))).head()
    val cut = loHi.getLong(0) + (loHi.getLong(1) - loHi.getLong(0)) / 10
    val dim = tables.orders.where(col("o_orderkey") <= cut)
      .select(col("o_orderkey"), col("o_orderdate"))
    val fact = ZoneMaps.joinPrunedRead(spark, d3, "l_orderkey", dim, "o_orderkey")
    assert(fact.inputFiles.length > 0 && fact.inputFiles.length < 6,
      s"narrow dim range should prune files, scanned ${fact.inputFiles.length}/6")
    // the pruned join equals the naive join — the join equality is the residual
    val got = fact.join(dim, col("l_orderkey") === col("o_orderkey")).count()
    val want = spark.read.parquet(d3)
      .join(dim, col("l_orderkey") === col("o_orderkey")).count()
    assert(got == want && want > 0)
    // empty dim: everything pruned, zero rows, no error
    val none = ZoneMaps.joinPrunedRead(spark, d3, "l_orderkey",
      dim.where(lit(false)), "o_orderkey")
    assert(none.count() == 0)
  }

  test("clusteredWriteZ: one layout prunes on EITHER column; single-column layout cannot") {
    val dz = Files.createTempDirectory("graft_zm_z_").toString
    ZoneMaps.clusteredWriteZ(tables.lineitem, "l_orderkey", "l_shipdate", dz, 16)
    val man = ZoneMaps.build(spark, dz, Seq("l_orderkey", "l_shipdate")).collect()
    assert(man.length == 16)
    val okLoHi = tables.lineitem
      .agg(min(col("l_orderkey")), max(col("l_orderkey"))).head()
    val okCut = okLoHi.getLong(0) + (okLoHi.getLong(1) - okLoHi.getLong(0)) / 8
    // predicate on the FIRST z column prunes
    val byKey = ZoneMaps.pruneFiles(man, "l_orderkey",
      okLoHi.getLong(0), okCut, hiInclusive = true)
    assert(byKey.nonEmpty && byKey.length < 16,
      s"orderkey slice should prune z-files, kept ${byKey.length}/16")
    // predicate on the SECOND z column prunes too — same layout
    val byDate = ZoneMaps.pruneFiles(man, "l_shipdate",
      ts("1995-01-01T00:00:00Z"), ts("1996-01-01T00:00:00Z"))
    assert(byDate.nonEmpty && byDate.length < 16,
      s"shipdate slice should prune z-files, kept ${byDate.length}/16")
    // pruned reads stay exact on both axes
    val gotK = spark.read.parquet(byKey.toIndexedSeq: _*)
      .where(col("l_orderkey") <= okCut).count()
    val wantK = tables.lineitem.where(col("l_orderkey") <= okCut).count()
    assert(gotK == wantK && wantK > 0)
    // CONTRAST: the single-column layout by orderkey leaves shipdate
    // envelopes spanning the whole domain — the same date slice keeps
    // every file (this is WHY z-order exists)
    val d1 = Files.createTempDirectory("graft_zm_single_").toString
    ZoneMaps.clusteredWrite(tables.lineitem, "l_orderkey", d1, 16)
    val man1 = ZoneMaps.build(spark, d1, Seq("l_shipdate")).collect()
    val byDate1 = ZoneMaps.pruneFiles(man1, "l_shipdate",
      ts("1995-01-01T00:00:00Z"), ts("1996-01-01T00:00:00Z"))
    assert(byDate1.length > byDate.length,
      s"z layout (${byDate.length} files) must beat key-only layout " +
        s"(${byDate1.length} files) on the other column")
  }

  test("incrementalBuild: batch-only scan equals a full rebuild after append") {
    val d2 = Files.createTempDirectory("graft_zm_incr_").toString
    ZoneMaps.clusteredWrite(
      tables.lineitem.where(col("l_orderkey") % 3 =!= 0), "l_shipdate", d2, 4)
    val standing = ZoneMaps.build(spark, d2, Seq("l_shipdate")).collect()
    // ingest batch: two more files land in the directory
    tables.lineitem.where(col("l_orderkey") % 3 === 0)
      .repartitionByRange(2, col("l_shipdate"))
      .sortWithinPartitions("l_shipdate")
      .write.mode("append").parquet(d2)
    val maintained = ZoneMaps
      .incrementalBuild(spark, d2, Seq("l_shipdate"), standing)
    val rebuilt = ZoneMaps.build(spark, d2, Seq("l_shipdate")).collect()
    def key(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      (r.getAs[String]("file"), r.getAs[Long]("n_rows"),
        String.valueOf(r.getAs[Any]("l_shipdate_min")),
        String.valueOf(r.getAs[Any]("l_shipdate_max")))).toSet
    assert(maintained.length == 6 && rebuilt.length == 6)
    assert(key(maintained) == key(rebuilt),
      "maintained manifest must equal the from-scratch rebuild")
    // standing rows survive verbatim (object identity of the kept subset)
    assert(standing.forall(maintained.contains))
  }

  test("prepareTable: one call yields clustering + manifest + catalog stats") {
    val out = Files.createTempDirectory("graft_zm_prep_").toString + "/t"
    val name = GraftSession.prepareTable(spark, "graft_zm_prep_spec",
      s"$sf/orders.parquet", out, "o_orderdate",
      Seq("o_custkey"), nFiles = 4)
    // catalog table live with column stats (NDV present after ANALYZE)
    val rel = spark.table(name).queryExecution.optimizedPlan
    val stats = rel.stats.attributeStats
    assert(stats.exists { case (a, s) =>
      a.name == "o_custkey" && s.distinctCount.isDefined })
    // the manifest was built and prunes: a narrow range scans a strict
    // subset and equals the naive filter
    val lo = ts("1996-01-01T00:00:00Z"); val hi = ts("1997-01-01T00:00:00Z")
    val pruned = ZoneMaps.prunedRead(spark, out, "o_orderdate", lo, hi,
      tsCol("1996-01-01 00:00:00"), tsCol("1997-01-01 00:00:00"))
    assert(pruned.inputFiles.length < 4)
    val want = spark.read.parquet(out)
      .where(col("o_orderdate") >= tsCol("1996-01-01 00:00:00") &&
        col("o_orderdate") < tsCol("1997-01-01 00:00:00")).count()
    assert(pruned.count() == want)
    spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  test("q133 registered query: pruned flag true, groups match naive") {
    val got = SparkEntry.queries("q133_zonemap_prune")(spark, sf)
    val rows = got.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("pruned")))
    assert(rows.forall(_.getAs[Int]("files_total") == ZoneMaps.demoFiles))
    val want = tables.lineitem
      .where(col("l_shipdate") >= tsCol("1996-01-01 00:00:00") &&
        col("l_shipdate") < tsCol("1997-01-01 00:00:00"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        (round(sum(col("l_quantity")), 4) + lit(0.0)).as("sum_qty"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val gotSet = rows.map(r => (r.getAs[String]("l_returnflag"),
      r.getAs[Long]("n_rows"), r.getAs[Double]("sum_qty"))).toSet
    assert(gotSet == want)
  }
}
