package graft.sources

import org.apache.hadoop.fs.Path

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo,
  Expression, GreaterThan, GreaterThanOrEqual, In, InSet, LessThan,
  LessThanOrEqual, Literal}
import org.apache.spark.sql.execution.datasources.{FileIndex,
  PartitionDirectory}
import org.apache.spark.sql.types.StructType

import graft.SessionKeyedCache

/** The PLANNER-TRANSPARENT serve path of the zone-map layer: a
  * [[FileIndex]] that answers `listFiles` from the (session-memoized,
  * possibly persisted) manifest instead of the raw directory listing — so
  * a user writing RAW SQL (or `spark.table`) against a
  * [[graft.GraftSession.prepareTable]]-registered table gets file-grain
  * pruning with NO `ZoneMaps.*` API call in sight. This is the same
  * architectural seam every lakehouse table format occupies (Delta's
  * TahoeFileIndex, Iceberg's planFiles — public designs): Spark's
  * `FileSourceScanExec` hands the PUSHED-DOWN data filters to
  * `FileIndex.listFiles(partitionFilters, dataFilters)` at physical
  * planning, which is exactly the information the manifest needs and
  * exactly the moment file skipping must happen — before any footer is
  * opened or task scheduled. The reference enumerates every split
  * unconditionally (`AM/ApplicationMaster.java:882-903`); this layer makes
  * the engine's scan enumeration statistics-driven even when the query
  * arrives as SQL text.
  *
  * Correctness contract (the [[ZoneMaps]] invariants, unchanged):
  *   - envelope pruning drops a file only when its [min, max] provably
  *     misses the predicate interval — the predicate itself still runs on
  *     the survivors (Spark re-applies every filter), so envelope
  *     looseness can only over-keep;
  *   - membership (bloom) pruning fires only for `=`/`IN` on a column
  *     whose manifest carries a bloom AND whose memo is already seeded
  *     (prepareTable / loadManifest) — `mightContainLong` is the exact
  *     hash the build inserted with, so no false negatives;
  *   - the evaluator follows the boolean structure: AND intersects
  *     survivor sets, OR unions them (a two-tail `k < a OR k >= b` skips
  *     the interior files) and only when BOTH branches are constrained;
  *     a filter shape the extractor does not understand contributes no
  *     constraint (scan everything it matches — never a wrong skip);
  *   - NULL envelopes (all-NULL files) only drop under null-rejecting
  *     range/equality predicates, which is what reaches dataFilters.
  *
  * Scale notes: the manifest consult is driver-side over #files rows (the
  * same object every table format's planner holds); the underlying
  * listing is delegated, so partition-pruning and listing parallelism are
  * untouched. At ≥10⁵ files the distributed probe
  * ([[ZoneMaps.membershipPruneFilesDistributed]]) is the drop-in for the
  * bloom branch.
  */
final class ZoneMapFileIndex(
    spark: SparkSession,
    val underlying: FileIndex,
    val dir: String,
    val zoneCols: Seq[String],
    val bloomCols: Seq[String]) extends FileIndex with Logging {

  override def rootPaths: Seq[Path] = underlying.rootPaths
  override def partitionSchema: StructType = underlying.partitionSchema
  override def inputFiles: Array[String] = underlying.inputFiles
  override def sizeInBytes: Long = underlying.sizeInBytes
  override def refresh(): Unit = underlying.refresh()
  override def metadataOpsTimeNs: Option[Long] = underlying.metadataOpsTimeNs

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val base = underlying.listFiles(partitionFilters, dataFilters)
    ZoneMapFileIndex.survivors(spark, dir, zoneCols, bloomCols, dataFilters) match {
      case None => base
      case Some(keep) =>
        val kept = base.map { pd =>
          pd.copy(files = pd.files.filter(f =>
            keep(ZoneMapFileIndex.normPath(f.getPath.toString))))
        }
        logInfo(s"zone-map transparent prune on $dir: " +
          s"${kept.map(_.files.length).sum}/${base.map(_.files.length).sum} files")
        kept
    }
  }
}

object ZoneMapFileIndex {

  /** Session registry of transparently-pruned directories:
    * normalized dir → (dir as the manifest memos key it, zoneCols,
    * bloomCols). [[graft.GraftSession.prepareTable]] registers;
    * [[graft.plans.ApplyZoneMapIndex]] consults on every plan.
    * Session-keyed like every engine memo: a fresh session re-registers
    * via [[enable]] (typically right after [[ZoneMaps.loadManifest]] —
    * #files rows, zero data jobs). */
  private val registry =
    new SessionKeyedCache[String, (String, Seq[String], Seq[String])]()

  private[graft] def normPath(p: String): String =
    try new Path(p).toUri.getPath
    catch { case _: IllegalArgumentException => p }

  /** Turn transparent pruning ON for `dir` in this session. Idempotent;
    * call after the manifest memo is seeded (prepareTable does both).
    * `dir` must be the SAME string the manifest memos were seeded under
    * (the build/loadManifest argument) — the registry keys by normalized
    * path but keeps the verbatim string for memo lookups. */
  def enable(spark: SparkSession, dir: String, zoneCols: Seq[String],
             bloomCols: Seq[String] = Nil): Unit = {
    registry.put(spark, normPath(dir), (dir, zoneCols, bloomCols))
    ()
  }

  /** Drop `dir`'s transparent registration (the [[ZoneMaps.dropMemos]]
    * fresh-session simulation hook; also the opt-out). */
  private[graft] def disable(spark: SparkSession, dir: String): Unit =
    registry.purgeKeys(spark, _ == normPath(dir))

  /** The registration for a single-root FileIndex, if any — exact
    * directory match (a scan listing explicit FILES under the dir, e.g.
    * the explicit `prunedRead` API's survivor scan, has different roots
    * and is deliberately not re-pruned). */
  def registeredFor(spark: SparkSession,
                    location: FileIndex): Option[(String, Seq[String], Seq[String])] =
    location.rootPaths match {
      case Seq(single) => registry.peek(spark, normPath(single.toString))
      case _ => None
    }

  /** One extracted constraint on a zone column: an interval with
    * inclusive/exclusive ends (None = unbounded), plus an optional
    * key SET for membership-grade pruning. */
  private final case class Constraint(lo: Option[(Any, Boolean)],
                                      hi: Option[(Any, Boolean)],
                                      keys: Option[Array[Long]])

  /** The survivor file set for `dataFilters`, or None when no pushed
    * filter constrains a zone column (scan everything — the lossless
    * default). Conjuncts intersect; inside a conjunct the evaluator
    * recurses the boolean structure — AND intersects (an unconstrained
    * side is neutral), OR unions and is usable ONLY when BOTH sides are
    * constrained (one open side makes the disjunction unbounded, so it
    * contributes nothing — never a wrong skip). Driver-side over the
    * memoized manifest rows. */
  private[graft] def survivors(spark: SparkSession, dir: String,
                               zoneCols: Seq[String], bloomCols: Seq[String],
                               dataFilters: Seq[Expression]): Option[Set[String]] = {
    val sets = dataFilters.flatMap(
      survivorsOf(spark, dir, zoneCols.toSet, bloomCols.toSet, _))
    if (sets.isEmpty) None else Some(sets.reduce(_ intersect _))
  }

  /** Survivor set of ONE predicate subtree; None = no usable constraint
    * (all files). */
  private def survivorsOf(spark: SparkSession, dir: String, zone: Set[String],
                          bloom: Set[String],
                          e: Expression): Option[Set[String]] = e match {
    case And(l, r) =>
      (survivorsOf(spark, dir, zone, bloom, l),
        survivorsOf(spark, dir, zone, bloom, r)) match {
        case (Some(a), Some(b)) => Some(a intersect b)
        case (a, b) => a.orElse(b)
      }
    case org.apache.spark.sql.catalyst.expressions.Or(l, r) =>
      for (a <- survivorsOf(spark, dir, zone, bloom, l);
           b <- survivorsOf(spark, dir, zone, bloom, r)) yield a union b
    case leaf => extractLeaf(leaf, zone).map { case (c, con) =>
      filesFor(spark, dir, bloom, c, con)
    }
  }

  /** The files a single (column, constraint) keeps — envelope test, then
    * the bloom probe when the column has a SEEDED membership memo
    * (transparent serving must never trigger a fact-data scan to build
    * blooms mid-query). Every set is computed against the column's own
    * manifest memo (seeded by prepareTable / loadManifest — single-column
    * keys carry the full multi-column rows). */
  private def filesFor(spark: SparkSession, dir: String, bloom: Set[String],
                       c: String, con: Constraint): Set[String] = {
    val man = ZoneMaps.manifestRows(spark, dir, Seq(c))
    val byEnvelope = man.filter { r =>
      val mn = r.getAs[Any](s"${c}_min")
      val mx = r.getAs[Any](s"${c}_max")
      mn != null && mx != null &&
        con.lo.forall { case (lo, inc) =>
          val d = ZoneMaps.cmpExternal(mx, lo); if (inc) d >= 0 else d > 0 } &&
        con.hi.forall { case (hi, inc) =>
          val d = ZoneMaps.cmpExternal(mn, hi); if (inc) d <= 0 else d < 0 }
    }.map(_.getAs[String]("file"))
    val files = con.keys match {
      case Some(ks) if bloom.contains(c) =>
        ZoneMaps.membershipRowsIfSeeded(spark, dir, c) match {
          case Some(mrows) =>
            val byBloom = ZoneMaps.membershipPruneFiles(mrows, c, ks).toSet
            byEnvelope.filter(byBloom.contains)
          case None => byEnvelope
        }
      case _ => byEnvelope
    }
    files.map(normPath).toSet
  }

  /** Extract (column, constraint) from one comparison leaf. Unsupported
    * shapes yield None — never a wrong skip. Only literal bounds count;
    * non-deterministic or attribute-vs-attribute comparisons are ignored. */
  private def extractLeaf(e: Expression,
                          zone: Set[String]): Option[(String, Constraint)] = e match {
    case GreaterThanOrEqual(a: Attribute, Literal(v, dt)) if zone(a.name) && v != null =>
      Some(a.name -> Constraint(Some((ext(v, dt), true)), None, None))
    case GreaterThan(a: Attribute, Literal(v, dt)) if zone(a.name) && v != null =>
      Some(a.name -> Constraint(Some((ext(v, dt), false)), None, None))
    case LessThanOrEqual(a: Attribute, Literal(v, dt)) if zone(a.name) && v != null =>
      Some(a.name -> Constraint(None, Some((ext(v, dt), true)), None))
    case LessThan(a: Attribute, Literal(v, dt)) if zone(a.name) && v != null =>
      Some(a.name -> Constraint(None, Some((ext(v, dt), false)), None))
    // literal-first orientations (the optimizer does not canonicalize
    // every source of pushed filters)
    case GreaterThanOrEqual(Literal(v, dt), a: Attribute) if zone(a.name) && v != null =>
      Some(a.name -> Constraint(None, Some((ext(v, dt), true)), None))
    case GreaterThan(Literal(v, dt), a: Attribute) if zone(a.name) && v != null =>
      Some(a.name -> Constraint(None, Some((ext(v, dt), false)), None))
    case LessThanOrEqual(Literal(v, dt), a: Attribute) if zone(a.name) && v != null =>
      Some(a.name -> Constraint(Some((ext(v, dt), true)), None, None))
    case LessThan(Literal(v, dt), a: Attribute) if zone(a.name) && v != null =>
      Some(a.name -> Constraint(Some((ext(v, dt), false)), None, None))
    case EqualTo(a: Attribute, Literal(v, dt)) if zone(a.name) && v != null =>
      val x = ext(v, dt)
      Some(a.name -> Constraint(Some((x, true)), Some((x, true)), longsOf(Seq(x))))
    case EqualTo(Literal(v, dt), a: Attribute) if zone(a.name) && v != null =>
      val x = ext(v, dt)
      Some(a.name -> Constraint(Some((x, true)), Some((x, true)), longsOf(Seq(x))))
    case In(a: Attribute, list) if zone(a.name) && list.nonEmpty &&
        list.forall { case Literal(v, _) => v != null; case _ => false } =>
      val xs = list.collect { case Literal(v, dt) => ext(v, dt) }
      Some(inConstraint(a.name, xs))
    case InSet(a: Attribute, hset) if zone(a.name) && hset.nonEmpty &&
        !hset.contains(null) =>
      // InSet holds CATALYST values of the attribute's type
      val xs = hset.toSeq.map(v => ext(v, a.dataType))
      Some(inConstraint(a.name, xs))
    case _ => None
  }

  private def inConstraint(name: String, xs: Seq[Any]): (String, Constraint) = {
    val ord = Ordering.fromLessThan[Any](ZoneMaps.cmpExternal(_, _) < 0)
    name -> Constraint(Some((xs.min(ord), true)), Some((xs.max(ord), true)),
      longsOf(xs))
  }

  /** Catalyst internal value → external comparable (the form manifest rows
    * collect as — java.sql/java.time temporals, boxed numerics, String). */
  private def ext(v: Any, dt: org.apache.spark.sql.types.DataType): Any =
    CatalystTypeConverters.convertToScala(v, dt)

  /** The key set as sorted longs when every value is integral (the
    * membership probe's domain); None otherwise. */
  private def longsOf(xs: Seq[Any]): Option[Array[Long]] = {
    val ls = xs.collect {
      case b: java.lang.Byte => b.longValue
      case s: java.lang.Short => s.longValue
      case i: java.lang.Integer => i.longValue
      case l: java.lang.Long => l.longValue
    }
    if (ls.length == xs.length) Some(ls.toArray.sorted) else None
  }
}
