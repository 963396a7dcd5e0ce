package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RelationalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("q44: recursive scaffold yields exactly months 1..12 and conserves the 1995 order count") {
    val rows = graft.operators.Relational3.q44RecursiveCte(tables).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rows.keySet === (1 to 12).toSet, "the scaffold must be gapless")
    val total = tables.orders.where(year(col("o_orderdate")) === 1995).count()
    assert(rows.values.sum === total)
  }

  test("q45/variant: parse_json + variant_get extract typed values incl. nested paths") {
    import spark.implicits._
    val df = Seq((1L, """{"a": {"b": [1, 2, 3]}, "s": "x"}""")).toDF("id", "js")
    val r = df.select(
      variant_get(parse_json(col("js")), "$.a.b[1]", "int").as("b1"),
      variant_get(parse_json(col("js")), "$.s", "string").as("s")).head()
    assert(r.getInt(0) === 2 && r.getString(1) === "x")
    // the registered aggregation sees the same k values q19's string path sees
    val variant = graft.operators.Relational3.q45Variant(tables)
      .select("event_type", "sum_k").collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    val string = tables.events
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy("event_type").agg(sum("k").as("sum_k"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(variant === string)
  }

  test("q46: FILTER-clause aggregates match their CASE-WHEN equivalents") {
    val got = graft.operators.Relational3.q46FilterAgg(tables).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5))))).toMap
    val exp = tables.orders
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        count(when(col("o_totalprice") > 200000, 1)).as("n_big"),
        round(coalesce(sum(when(col("o_totalprice") > 200000, col("o_totalprice"))),
          lit(0.0)), 2).as("big_value"),
        round(avg(when(col("o_totalprice") > 400000, col("o_totalprice"))), 4).as("avg_huge"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5))))).toMap
    assert(got === exp)
    assert(got.values.exists(_._2 > 0), "some group must have qualifying rows")
    assert(got.values.exists(v => v._2 < v._1), "the filter must exclude rows somewhere")
  }

  test("q47: listagg concatenates in the WITHIN GROUP order") {
    val rows = graft.operators.Relational3.q47Listagg(tables).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    rows.foreach { case (_, (nations, n)) =>
      val parts = nations.split(",").toSeq
      assert(parts.length.toLong === n, "one member per nation")
      assert(parts === parts.sorted, "members must follow the ORDER BY")
    }
    // cross-check one group against the relational path
    val expected = tables.nation
      .join(tables.region, col("n_regionkey") === col("r_regionkey"))
      .where(col("r_name") === rows.keys.min)
      .select("n_name").collect().map(_.getString(0)).sorted.mkString(",")
    assert(rows(rows.keys.min)._1 === expected)
  }

  test("q48: percent_rank/cume_dist bounds and the nth_value full-frame contract") {
    val groups = graft.operators.Relational3.q48WindowDist(tables).collect()
      .groupBy(_.getLong(0))
    groups.foreach { case (_, rs) =>
      val prs = rs.map(_.getDouble(2))
      if (rs.length > 1) assert(prs.min === 0.0 && prs.max === 1.0)
      else assert(prs.head === 0.0) // single row: (rank-1)/(n-1) defined as 0
      assert(rs.map(_.getDouble(3)).max === 1.0, "cume_dist tops out at 1")
      // full ROWS frame → every row of the group sees the same 2nd order,
      // NULL exactly when the customer has a single order
      val second = rs.map(r => if (r.isNullAt(4)) None else Some(r.getLong(4))).distinct
      assert(second.length === 1)
      assert(second.head.isDefined === (rs.length > 1))
    }
  }

  test("q51: regexp battery matches a JVM-regex re-derivation on every row") {
    import spark.implicits._
    val texts = tables.documents.select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    val sWord = "\\b(s[a-z]+)\\b".r
    val vowels = "[aeiou][aeiou]".r
    val rows = graft.operators.Relational4.q51Regexp(tables).collect()
    assert(rows.length === texts.size)
    rows.foreach { r =>
      val t = texts(r.getLong(0))
      assert(r.getString(1) === sWord.findFirstMatchIn(t).map(_.group(1)).getOrElse(""))
      assert(r.getInt(2) === vowels.findAllIn(t).length)
      assert(r.getBoolean(3) === "stream".r.findFirstIn(t).isDefined)
      assert(r.getString(4) === sWord.findAllMatchIn(t).map(_.group(1)).mkString(","))
    }
    assert(rows.exists(_.getString(4).nonEmpty), "some doc must contain s-words")
  }

  test("q52: moments/regression aggregates match direct two-pass computation") {
    import spark.implicits._
    val data = tables.lineitem.select("l_returnflag", "l_discount", "l_tax")
      .as[(String, Double, Double)].collect().groupBy(_._1)
    val rows = graft.operators.Relational4.q52StatsAgg(tables).collect()
    assert(rows.length === data.size)
    rows.foreach { r =>
      val xs = data(r.getString(0)).map(_._2)
      val ys = data(r.getString(0)).map(_._3)
      val n = xs.length.toDouble
      val (mx, my) = (xs.sum / n, ys.sum / n)
      val sxx = xs.map(x => (x - mx) * (x - mx)).sum
      val syy = ys.map(y => (y - my) * (y - my)).sum
      val sxy = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      def close(got: Double, exp: Double, what: String): Unit =
        assert(math.abs(got - exp) < 1e-6 + 1e-9, s"$what: $got vs $exp")
      assert(r.getLong(1) === xs.length.toLong)
      close(r.getDouble(2), sxy / math.sqrt(sxx * syy), "corr")
      close(r.getDouble(3), sxy / (n - 1), "covar_samp")
      close(r.getDouble(4), sxy / n, "covar_pop")
      close(r.getDouble(5), sxx / (n - 1), "var_samp")
      close(r.getDouble(6), math.sqrt(sxx / n), "stddev_pop")
      val slope = sxy / sxx
      close(r.getDouble(7), slope, "slope")
      close(r.getDouble(8), my - slope * mx, "intercept")
      val rr = sxy / math.sqrt(sxx * syy)
      close(r.getDouble(9), rr * rr, "r2")
      assert(r.getLong(10) === xs.length.toLong)
    }
  }

  test("q53: bitwise/boolean folds and the interpolated median match a JVM fold") {
    import spark.implicits._
    val data = tables.orders.select("o_orderpriority", "o_custkey", "o_totalprice")
      .as[(String, Long, Double)].collect().groupBy(_._1)
    val rows = graft.operators.Relational4.q53BitwiseAgg(tables).collect()
    assert(rows.length === data.size)
    rows.foreach { r =>
      val ks = data(r.getString(0)).map(_._2)
      val ps = data(r.getString(0)).map(_._3)
      assert(r.getLong(1) === ks.reduce(_ & _))
      assert(r.getLong(2) === ks.reduce(_ | _))
      assert(r.getLong(3) === ks.reduce(_ ^ _))
      assert(r.getBoolean(4) === ps.forall(_ > 1000))
      assert(r.getBoolean(5) === ps.exists(_ > 400000))
      assert(r.getLong(6) === ps.count(_ > 200000).toLong)
      val sorted = ks.sorted
      val m =
        if (sorted.length % 2 == 1) sorted(sorted.length / 2).toDouble
        else (sorted(sorted.length / 2 - 1) + sorted(sorted.length / 2)) / 2.0
      assert(r.getDouble(7) === m, "median must be the exact interpolated midpoint")
    }
  }

  test("q54: sequences match Range/LocalDate re-derivations, bounds inclusive") {
    val rows = graft.operators.Relational4.q54Sequence(tables).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = r.getInt(0)
      assert(r.getString(1) === (0 to k % 5).mkString(","))
      assert(r.getString(2) === (10 to (0 - k % 7) by -3).mkString(","))
      val d0 = java.time.LocalDate.of(2024, 1, 15)
      assert(r.getString(3) ===
        (0 to k % 6).map(i => d0.plusMonths(i.toLong).toString).mkString(","))
    }
  }

  test("q55: string battery matches JVM string ops on every customer") {
    import spark.implicits._
    val names = tables.customer.select("c_custkey", "c_name")
      .as[(Long, String)].collect().toMap
    val rows = graft.operators.Relational4.q55Strings(tables).collect()
    assert(rows.length === names.size)
    rows.foreach { r =>
      val nm = names(r.getLong(0))
      val padded = if (nm.length >= 22) nm.take(22) else "*" * (22 - nm.length) + nm
      assert(r.getString(1) === padded)
      assert(r.getString(2) === nm.map(c => if (c == '#') '-' else if (c == '0') 'x' else c))
      assert(r.getString(3) === nm.reverse)
      assert(r.getString(4) === nm.take(8))
      assert(r.getString(5) === nm.takeRight(4))
      assert(r.getString(6) === nm.split("#", -1).lift(1).getOrElse(""))
      assert(r.getString(7) === nm.take(2) * 3)
      assert(r.getInt(8) === nm.indexOf('9') + 1)
      assert(r.getInt(9) === nm.last.toInt)
    }
  }

  test("every declared query runs and returns a stable schema at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      assert(df.count() >= 0, s"$name failed to execute")
    }
  }

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("semi + anti join partition the customer set") {
    val cust = tables.customer.count()
    val highVal = tables.orders.filter(col("o_totalprice") > 300000).select("o_custkey")
    val semi = tables.customer.join(highVal, col("c_custkey") === col("o_custkey"), "left_semi").count()
    val anti = tables.customer.join(highVal, col("c_custkey") === col("o_custkey"), "left_anti").count()
    assert(semi + anti === cust)
  }

  test("top-k matches sort-then-take") {
    val topk = operators.Relational.q10TopK(tables).collect().map(_.getLong(0))
    val full = tables.orders.orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10).select("o_orderkey").collect().map(_.getLong(0))
    assert(topk.sameElements(full))
  }

  test("cube contains the grand total") {
    val grand = operators.Relational.q12Cube(tables)
      .filter(col("g_flag") === 1 && col("g_status") === 1).collect()
    assert(grand.length === 1)
    assert(grand(0).getAs[Long]("n") === tables.lineitem.count())
  }

  test("approx_count_distinct within 5% of exact (HLL++ scale path)") {
    val r = tables.lineitem.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx")).collect()(0)
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05)
  }

  test("every oracleSql key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("grouping sets emit exactly the declared set shapes with a grand total") {
    val gs = operators.Relational3.q36GroupingSets(tables)
    val grand = gs.filter(col("g_seg") === 1 && col("g_nation") === 1).collect()
    assert(grand.length === 1)
    assert(grand(0).getAs[Long]("n_cust") === tables.customer.count())
    // rollup-style subtotal rows present, cube-only shape (seg=1, nation=0) absent
    assert(gs.filter(col("g_seg") === 0 && col("g_nation") === 1).count() > 0)
    assert(gs.filter(col("g_seg") === 1 && col("g_nation") === 0).count() === 0)
  }

  test("date_trunc buckets partition all orders") {
    val buckets = operators.Relational3.q37DateTrunc(tables)
    assert(buckets.agg(sum(col("n_orders"))).collect()(0).getLong(0) === tables.orders.count())
    // month_end is always the last day of month_start's month
    assert(buckets.filter(
      last_day(col("month_start").cast("date")) =!= col("month_end").cast("date")).count() === 0)
  }

  test("to_json output parses back to the source columns") {
    val parsed = operators.Relational3.q38ToJson(tables)
      .select(col("event_id"),
        from_json(col("js"),
          org.apache.spark.sql.types.DataType.fromDDL("struct<et:string,k:int>")).as("s"))
      .select(col("event_id"), col("s.et").as("event_type"), col("s.k").as("k"))
    val src = tables.events.select(col("event_id"), col("event_type"),
      get_json_object(col("props"), "$.k").cast("int").as("k"))
    assert(parsed.exceptAll(src).count() === 0 && src.exceptAll(parsed).count() === 0)
  }

  test("q56: interval RANGE frames match a JVM per-user sliding recount") {
    import spark.implicits._
    val byUser = tables.events
      .select(col("user_id"), col("ts").cast("long"), col("value"))
      .as[(Long, Long, Double)].collect().groupBy(_._1)
    val rows = graft.operators.Relational4.q56RangeInterval(tables).collect()
    val evts = tables.events.select(col("event_id"), col("user_id"), col("ts").cast("long"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows.nonEmpty)
    rows.take(500).foreach { r =>
      val (uid, t) = evts(r.getLong(0))
      val peers = byUser(uid)
      val lastHour = peers.filter(p => p._2 >= t - 3600 && p._2 <= t)
      val nextHalf = peers.filter(p => p._2 >= t && p._2 <= t + 1800)
      assert(r.getLong(2) === lastHour.length.toLong, s"n_last_hour for event ${r.getLong(0)}")
      assert(math.abs(r.getDouble(3) - lastHour.map(_._3).sum) < 1e-3)
      assert(r.getLong(4) === nextHalf.length.toLong)
    }
  }

  test("q58: sketch estimates sit inside published error bounds and are deterministic") {
    val run1 = graft.operators.Relational4.q58ApproxSketches(tables).collect()
      .map(r => r.getString(0) -> r).toMap
    val run2 = graft.operators.Relational4.q58ApproxSketches(tables).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(run1.nonEmpty)
    run1.foreach { case (et, r) =>
      // HLL++ at default rsd 0.05: allow 3 standard deviations
      assert(r.getDouble(4) <= 0.15,
        s"$et: approx_count_distinct error ${r.getDouble(4)} beyond 3x rsd")
      // GK quantile sketch at accuracy 10000 over n values: rank error
      // <= n/accuracy ranks; translate to a generous value tolerance via
      // the exact p85/p95 band
      val (lo, hi) = (r.getDouble(5) * 0.8 - 1, r.getDouble(5) * 1.2 + 1)
      assert(r.getDouble(6) >= lo && r.getDouble(6) <= hi,
        s"$et: approx p90 ${r.getDouble(6)} far from exact ${r.getDouble(5)}")
      // determinism: the sketches are deterministic folds of the data
      val r2 = run2(et)
      assert(r.getLong(3) === r2.getLong(3) && r.getDouble(6) === r2.getDouble(6))
    }
  }

  test("q59: date arithmetic matches java.time on every order, clamping included") {
    import spark.implicits._
    val dates = tables.orders.select(col("o_orderkey"), col("o_orderdate").cast("string"))
      .as[(Long, String)].collect().toMap
    val rows = graft.operators.Relational4.q59DateArith(tables).collect()
    assert(rows.length === dates.size)
    rows.take(1000).foreach { r =>
      val d = java.time.LocalDate.parse(dates(r.getLong(0)).take(10))
      assert(r.getString(1) === d.toString)
      assert(r.getString(2) === d.plusMonths(3).toString, "add_months must clamp like java.time")
      assert(r.getString(3) === d.plusDays(45).toString)
      assert(r.getInt(4) === d.getDayOfWeek.getValue % 7 + 1, "Spark dow: Sunday = 1")
      assert(r.getInt(5) === d.getDayOfYear)
      assert(r.getInt(6) === d.get(java.time.temporal.IsoFields.WEEK_OF_WEEK_BASED_YEAR))
      assert(r.getInt(7).toLong === d.toEpochDay)
      assert(r.getString(8) === java.time.LocalDate.of(d.getYear, 12, 31).toString)
    }
  }

  test("q60: array set ops match scala collection ops on every document") {
    import spark.implicits._
    val texts = tables.documents.select("doc_id", "text").as[(Long, String)].collect().toMap
    val rows = graft.operators.Relational4.q60ArraySetOps(tables).collect()
    assert(rows.length === texts.size)
    rows.take(500).foreach { r =>
      val toks = texts(r.getLong(0)).toLowerCase.split(" ", -1).toSeq
      val h = toks.length / 2
      val (t1, t2) = (toks.take(h), toks.drop(h))
      assert(r.getString(1) === t1.toSet.intersect(t2.toSet).toSeq.sorted.mkString(","))
      assert(r.getInt(2) === (t1 ++ t2).distinct.size)
      assert(r.getString(3) === t1.toSet.diff(t2.toSet).toSeq.sorted.mkString(","))
      assert(r.getBoolean(4) === t1.exists(t2.contains))
      assert(r.getLong(5) === (toks.indexOf("the") + 1).toLong)
    }
  }

  test("q61: levenshtein matches a JVM DP on every customer") {
    import spark.implicits._
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val src = tables.customer.select("c_custkey", "c_name", "c_mktsegment")
      .as[(Long, String, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val rows = graft.operators.Relational4.q61EditDistance(tables).collect()
    assert(rows.length === src.size)
    rows.take(300).foreach { r =>
      val (name, seg) = src(r.getLong(0))
      assert(r.getInt(1) === lev(name, name.reverse))
      assert(r.getInt(2) === lev(name, seg))
      assert(r.getDouble(3) === 1.0 - lev(name, seg).toDouble / math.max(name.length, seg.length))
      assert(r.getBoolean(4) === name.startsWith("Customer"))
    }
  }

  test("q63: gap-fill matches a JVM LOCF fold per priority partition") {
    import spark.implicits._
    val src = tables.orders
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .as[(Long, String, Double)].collect().groupBy(_._2)
    // JVM reference: walk each partition in key order carrying the last /
    // next non-null — the textbook LOCF definition
    val expected = src.flatMap { case (prio, rows) =>
      val sorted = rows.sortBy(_._1)
      val vs = sorted.map(r => if (r._1 % 3 == 0) None else Some(r._3))
      val down = vs.scanLeft(Option.empty[Double])((acc, v) => v.orElse(acc)).tail
      val up = vs.scanRight(Option.empty[Double])((v, acc) => v.orElse(acc)).init
      sorted.indices.map(i => (sorted(i)._1,
        (vs(i), down(i), up(i), vs(i).orElse(down(i)).orElse(up(i)))))
    }.toMap
    val rows = graft.operators.Relational4.q63GapFill(tables).collect()
    assert(rows.length === expected.size)
    def opt(r: org.apache.spark.sql.Row, n: String): Option[Double] = {
      val i = r.fieldIndex(n)
      if (r.isNullAt(i)) None else Some(r.getDouble(i))
    }
    rows.foreach { r =>
      val k = r.getLong(r.fieldIndex("o_orderkey"))
      assert((opt(r, "v"), opt(r, "fill_down"), opt(r, "fill_up"),
        opt(r, "filled")) === expected(k), s"orderkey=$k")
    }
  }

  test("q64: ordered agg CSV is sorted, distinct, partitioning-invariant") {
    val base = graft.operators.Relational4.q64OrderedAgg(tables).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getInt(2)))).toMap
    base.values.foreach { case (csv, n) =>
      val parts = csv.split(",").toSeq
      assert(parts === parts.sorted && parts.distinct === parts)
      assert(parts.length === n)
    }
    // the sort inside the aggregate is what makes the CSV deterministic:
    // a different physical partitioning must yield the identical strings
    val again = tables.orders.repartition(7)
      .groupBy(col("o_orderpriority")).agg(
        concat_ws(",", array_sort(collect_set(col("o_orderstatus"))))
          .as("statuses_csv"),
        size(collect_set(col("o_orderstatus"))).as("n_statuses"))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(again === base, "collect_set order must not leak into the CSV")
  }

  test("q103: nearest-event picks the closer side, ties earlier, respects tolerance") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // u1: clicks 5s before and 3s after the error → forward wins
      (10L, 1L, ts("2024-01-01 10:00:00"), "error"),
      (11L, 1L, ts("2024-01-01 09:59:55"), "click"),
      (12L, 1L, ts("2024-01-01 10:00:03"), "click"),
      // u2: exact ±4s tie → the EARLIER click wins
      (20L, 2L, ts("2024-01-01 10:00:00"), "error"),
      (21L, 2L, ts("2024-01-01 09:59:56"), "click"),
      (22L, 2L, ts("2024-01-01 10:00:04"), "click"),
      // u3: only click is 11 min away → outside ±10-min tolerance → null
      (30L, 3L, ts("2024-01-01 10:00:00"), "error"),
      (31L, 3L, ts("2024-01-01 10:11:00"), "click"),
      // u4: click at the exact error instant → diff 0
      (40L, 4L, ts("2024-01-01 10:00:00"), "error"),
      (41L, 4L, ts("2024-01-01 10:00:00"), "click")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = graft.operators.Temporal.nearestEvent(ev).collect()
      .map(r => r.getLong(0) -> ((Option(r.getString(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
    assert(got(10L) === ((Some("2024-01-01 10:00:03"), Some(3000000L))))
    assert(got(20L) === ((Some("2024-01-01 09:59:56"), Some(4000000L))))
    assert(got(30L) === ((None, None)))
    assert(got(40L) === ((Some("2024-01-01 10:00:00"), Some(0L))))
  }

  test("q105: sweep counts overlap, end-at-start does not overlap, midnight clips") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // duration = 60 + event_id % 240 seconds; ids chosen so all are 60 s
    val ev = Seq(
      (0L, ts("2024-01-01 10:00:00")),   // A [10:00:00, 10:01:00]
      (960L, ts("2024-01-01 10:00:30")), // B [10:00:30, 10:01:30] overlaps A
      (480L, ts("2024-01-01 10:01:00")), // C starts exactly as A ends — no overlap with A
      (240L, ts("2024-01-01 23:59:30"))  // D crosses midnight → tail on Jan 2
    ).toDF("event_id", "ts")
    val got = graft.operators.Relational5.concurrencySweep(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    // Jan 1: peak 2 (A+B), first reached when B starts; 4 intervals start
    assert(got("2024-01-01") === ((4L, 2L, "2024-01-01 10:00:30")))
    // Jan 2: only D's carried tail — peak 1 at midnight, zero starts
    assert(got("2024-01-02") === ((0L, 1L, "2024-01-02 00:00:00")))
  }

  test("q65: planted cohorts produce the hand-computed retention grid") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // u1/u2 first-active in the week of Mon 2024-01-01; u3 the week after
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-09 10:00:00")),
      (2L, ts("2024-01-03 09:00:00")),
      (3L, ts("2024-01-10 08:00:00")), (3L, ts("2024-01-17 08:00:00"))
    ).toDF("user_id", "ts")
    val got = graft.operators.Temporal.retentionCohorts(ev).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got === Map(
      ("2024-01-01", 0) -> ((2L, 2L, 1.0)),
      ("2024-01-01", 1) -> ((1L, 2L, 0.5)),
      ("2024-01-08", 0) -> ((1L, 1L, 1.0)),
      ("2024-01-08", 1) -> ((1L, 1L, 1.0))))
  }

  test("q66: funnel stages respect event ORDER, not mere presence") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // u1: full ordered funnel → stage 3
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (1L, ts("2024-01-01 11:00:00"), "click"),
      (1L, ts("2024-01-01 12:00:00"), "purchase"),
      // u2: click BEFORE the signup only → stage 1 (order is the semantics)
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 10:00:00"), "signup"),
      // u3: no signup at all → stage 0
      (3L, ts("2024-01-01 10:00:00"), "click"),
      // u4: purchase between signup and click → stage 2 (purchase must
      // follow the click, not just the signup)
      (4L, ts("2024-01-01 10:00:00"), "signup"),
      (4L, ts("2024-01-01 10:30:00"), "purchase"),
      (4L, ts("2024-01-01 11:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val got = graft.operators.Temporal.funnel(ev).collect()
      .map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(got === Map(1L -> 3, 2L -> 1, 3L -> 0, 4L -> 2))
  }

  test("q67: lag/lead IGNORE NULLS match a JVM nearest-non-null scan") {
    import spark.implicits._
    val src = tables.orders
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .as[(Long, String, Double)].collect().groupBy(_._2)
    val expected = src.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(_._1)
      val vs = sorted.map(r => if (r._1 % 3 == 0) None else Some(r._3))
      // prev_nn = last non-null STRICTLY before; next_nn = first STRICTLY after
      val prev = vs.scanLeft(Option.empty[Double])((acc, v) => v.orElse(acc)).init
      val next = vs.scanRight(Option.empty[Double])((v, acc) => v.orElse(acc)).tail
      sorted.indices.map(i => (sorted(i)._1, (vs(i), prev(i), next(i))))
    }.toMap
    val rows = graft.operators.Relational4.q67NavIgnoreNulls(tables).collect()
    assert(rows.length === expected.size)
    def opt(r: org.apache.spark.sql.Row, n: String): Option[Double] = {
      val i = r.fieldIndex(n)
      if (r.isNullAt(i)) None else Some(r.getDouble(i))
    }
    rows.foreach { r =>
      val k = r.getLong(r.fieldIndex("o_orderkey"))
      assert((opt(r, "v"), opt(r, "prev_nn"), opt(r, "next_nn")) === expected(k),
        s"orderkey=$k")
    }
  }

  test("q57: argmax/argmin rows match a JVM fold with the same tie order") {
    import spark.implicits._
    val evts = tables.events
      .select(col("event_type"), col("event_id"), col("user_id"), col("value"))
      .as[(String, Long, Long, Double)].collect().groupBy(_._1)
    val rows = graft.operators.Relational4.q57ArgExtremes(tables).collect()
    assert(rows.length === evts.size)
    rows.foreach { r =>
      val g = evts(r.getString(0))
      val amax = g.maxBy(e => (e._4, e._2))
      val amin = g.minBy(e => (e._4, e._2))
      assert(r.getLong(1) === g.length.toLong)
      assert(r.getDouble(2) === g.map(_._4).max && r.getDouble(3) === g.map(_._4).min)
      assert(r.getLong(4) === amax._2 && r.getLong(5) === amin._2)
      assert(r.getLong(6) === amax._3)
    }
  }

  test("q70: interval union matches a JVM sweep-line merge per user") {
    import spark.implicits._
    val ivs = tables.events
      .select(col("user_id"), unix_micros(col("ts")),
        unix_micros(col("ts")) + (lit(60L) + pmod(col("event_id"), lit(240L))) * lit(1000000L))
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    val rows = graft.operators.Relational4.q70IntervalUnion(tables).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val uid = r.getLong(0)
      // classic sweep: sort by start, merge overlapping/adjacent-at-overlap
      val sorted = ivs(uid).map(p => (p._2, p._3)).sortBy(identity)
      val merged = sorted.foldLeft(List.empty[(Long, Long)]) {
        case (Nil, iv) => List(iv)
        case ((s0, e0) :: rest, (s, e)) =>
          if (s > e0) (s, e) :: (s0, e0) :: rest
          else (s0, math.max(e0, e)) :: rest
      }.reverse
      assert(r.getLong(1) === merged.length.toLong, s"n_islands for user $uid")
      assert(r.getLong(2) === merged.map(p => p._2 - p._1).sum, s"covered_us for user $uid")
      assert(r.getLong(3) === ivs(uid).length.toLong, s"n_events for user $uid")
      assert(r.getLong(4) === merged.map(p => p._2 - p._1).max, s"longest for user $uid")
    }
    // the synthetic durations must actually produce overlap somewhere,
    // or the operator degenerates to sum-of-durations and tests nothing
    assert(rows.exists(r => r.getLong(1) < r.getLong(3)),
      "no user has overlapping intervals — the fixture lost its point")
  }

  test("q71: mode/median/quartile match a JVM fold with the pinned tie rules") {
    import spark.implicits._
    val li = tables.lineitem
      .select(col("l_returnflag"), col("l_quantity").cast("double"), col("l_extendedprice"))
      .as[(String, Double, Double)].collect().groupBy(_._1)
    val rows = graft.operators.Relational4.q71ModeMedian(tables).collect()
    assert(rows.map(_.getString(0)).toSet === li.keySet)
    rows.foreach { r =>
      val xs = li(r.getString(0))
      // mode: max count, min value on ties
      val freq = xs.groupBy(_._2).view.mapValues(_.size).toMap
      val (modeV, modeN) = freq.toSeq.minBy { case (v, n) => (-n, v) }
      assert(r.getDouble(1) === modeV && r.getLong(2) === modeN.toLong)
      // median: interpolated percentile 0.5 over sorted values
      val sp = xs.map(_._3).sorted
      val mid =
        if (sp.length % 2 == 1) sp(sp.length / 2)
        else (sp(sp.length / 2 - 1) + sp(sp.length / 2)) / 2.0
      assert(math.abs(r.getDouble(3) - mid) < 1e-4, "median_price")
      // discrete lower quartile: value at ordered position ceil(n/4)
      val sq = xs.map(_._2).sorted
      assert(r.getDouble(4) === sq((sq.length + 3) / 4 - 1), "q25_qty")
    }
  }

  test("q72: hash sample matches a JVM md5 replay; HT estimate lands near truth") {
    import java.security.MessageDigest
    def u32(key: Long): Long = {
      val hex = MessageDigest.getInstance("MD5").digest(key.toString.getBytes)
        .take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16)
    }
    import spark.implicits._
    val orders = tables.orders.select(col("o_orderkey"), col("o_orderpriority"))
      .as[(Long, String)].collect()
    def modOf(p: String): Long =
      if (p == "1-URGENT") 2L else if (p == "2-HIGH") 5L else 10L
    val expected = orders.filter { case (k, p) => u32(k) % modOf(p) == 0 }
      .groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val rows = graft.operators.Relational4.q72HashSample(tables).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getString(0)
      assert(r.getLong(1) === modOf(p), "stratum modulus")
      assert(r.getLong(2) === expected(p), s"JVM md5 replay for $p")
      assert(r.getLong(3) === r.getLong(2) * r.getLong(1), "HT estimate identity")
      // a 32-bit-uniform mod-m sample of n rows has sd ~ sqrt(n/m); allow 5 sd
      val n = r.getLong(4).toDouble
      val sd = math.sqrt(n / r.getLong(1))
      assert(math.abs(r.getLong(3) - n) <= 5 * sd * r.getLong(1) + r.getLong(1),
        s"HT estimate ${r.getLong(3)} implausibly far from $n for $p")
    }
  }

  test("q73: rolling slope matches a JVM OLS recount over the same frames") {
    import spark.implicits._
    val rows = tables.lineitem
      .select(col("l_returnflag"), col("l_shipdate").cast("string"), col("l_orderkey"),
        col("l_linenumber").cast("long"), col("l_quantity"),
        round(col("l_discount") * 100, 0))
      .as[(String, String, Long, Long, Double, Double)].collect()
    val got = graft.operators.Relational4.q73RollingRegression(tables).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2).toLong,
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(got.length === rows.length)
    val byFlag = rows.groupBy(_._1)
    val expected = byFlag.flatMap { case (flag, rs) =>
      val sorted = rs.sortBy(t => (t._2, t._3, t._4, t._5, t._6))
      sorted.indices.map { i =>
        val fr = sorted.slice(math.max(0, i - 29), i + 1)
        val n = fr.length.toDouble
        val sx = fr.map(_._5).sum; val sy = fr.map(_._6).sum
        val sxy = fr.map(t => t._5 * t._6).sum; val sxx = fr.map(t => t._5 * t._5).sum
        val den = n * sxx - sx * sx
        val slope = if (den == 0.0) None
          else Some(BigDecimal((n * sxy - sx * sy) / den)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0)
        (flag, sorted(i)._3, sorted(i)._4, slope)
      }
    }
    // multiset equality: duplicate id rows make row-level pairing
    // ambiguous by design, the permutation-invariance the operator pins
    def ms(xs: Iterable[(String, Long, Long, Option[Double])]) =
      xs.groupBy(identity).view.mapValues(_.size).toMap
    assert(ms(got.toSeq) === ms(expected), "rolling slopes diverge from the JVM recount")
  }

  test("q74: windowed discrete median/min/max match a JVM frame recount") {
    import spark.implicits._
    val rows = tables.lineitem
      .select(col("l_returnflag"), col("l_shipdate").cast("string"), col("l_orderkey"),
        col("l_linenumber").cast("long"), col("l_quantity"))
      .as[(String, String, Long, Long, Double)].collect()
    val got = graft.operators.Relational4.q74WindowMedian(tables).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2).toLong,
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    val expected = rows.groupBy(_._1).flatMap { case (flag, rs) =>
      val sorted = rs.sortBy(t => (t._2, t._3, t._4, t._5))
      sorted.indices.map { i =>
        val fr = sorted.slice(math.max(0, i - 29), i + 1).map(_._5).sorted
        (flag, sorted(i)._3, sorted(i)._4,
          fr((fr.length + 1) / 2 - 1), fr.head, fr.last)
      }
    }
    def ms[A](xs: Iterable[A]) = xs.groupBy(identity).view.mapValues(_.size).toMap
    assert(ms(got.toSeq) === ms(expected), "windowed medians diverge from the JVM recount")
  }

  test("q75: every 1024-key Z-block bounds BOTH dims within its 32-wide tile") {
    def interleave(x: Long, y: Long): Long =
      (0 until 10).map(i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    // JVM law behind the audit: an aligned 1024-key block IS a 32x32 tile
    val rows = graft.operators.Relational4.q75ZorderLayout(tables).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (minX, maxX) = (r.getLong(2), r.getLong(3))
      val (minY, maxY) = (r.getLong(4), r.getLong(5))
      assert(maxX - minX < 32, s"block ${r.getLong(0)} spans ${maxX - minX + 1} cust buckets")
      assert(maxY - minY < 32, s"block ${r.getLong(0)} spans ${maxY - minY + 1} price buckets")
      // the tile is ALIGNED: both dims stay inside one 32-wide aligned window
      assert(minX / 32 === maxX / 32 && minY / 32 === maxY / 32, s"block ${r.getLong(0)} unaligned")
    }
    // spot-check the interleave arithmetic against the JVM bit form
    import spark.implicits._
    val keys = tables.orders
      .select(pmod(col("o_custkey"), lit(1024L)),
        least(floor(col("o_totalprice") / lit(1000.0)).cast("long"), lit(1023L)))
      .as[(Long, Long)].collect().take(200)
    val blocks = rows.map(r => r.getLong(0)).toSet
    keys.foreach { case (x, y) =>
      assert(blocks.contains(interleave(x, y) / 1024), s"($x, $y) block missing")
    }
  }

  test("q79: the OFFSET page equals the JVM total-order slice (keyset-pagination parity)") {
    import spark.implicits._
    val page = graft.operators.Relational4.q79Pagination(tables).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(page.length === 50)
    // JVM replay: the same total order (v NULLS FIRST, id), rows 101-150 —
    // a keyset filter (v, id) > last-of-page-2 would select exactly these
    val all = tables.events
      .select(col("event_id"), col("value")).as[(Long, Double)].collect()
      .map { case (id, v) => (id, if (id % 7 == 0) None else Some(v)) }
    val ordered = all.sortBy { case (id, v) => (v.isDefined, v.getOrElse(0.0), id) }
    assert(page.toSeq === ordered.slice(100, 150).toSeq)
  }

  test("q81: TWAP weights by hold duration, not sample count (planted fixture + JVM replay)") {
    import spark.implicits._
    import graft.streaming.EventStreams.Event
    def ts(s: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:00:${s}%02d")
    // value 1.00 held 3 s, value 2.00 held 1 s → TWA 1.25; the PLAIN avg
    // of observed values would be 1.50 — the sampling-rate bias TWAP removes
    val fixture = Seq(
      Event(1, ts(0), 7, "v", 1.00), Event(2, ts(3), 7, "v", 2.00),
      Event(3, ts(4), 7, "v", 9.99) // last observation: no hold, excluded
    ).toDF()
    val r = graft.operators.Relational4.timeWeightedAvg(fixture).collect()
    assert(r.length === 1)
    assert(r.head.getLong(1) === 2L, "two holds")
    assert(r.head.getLong(2) === 4000000L, "4 s of coverage in microseconds")
    assert(r.head.getDouble(3) === 1.25)
    // corpus law: every user's TWA lies within its observed value range
    val rows = graft.operators.Relational4.q81TimeWeightedAvg(tables).collect()
    val ranges = tables.events.groupBy(col("user_id"))
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
      .collect().map(x => x.getLong(0) -> ((x.getDouble(1), x.getDouble(2)))).toMap
    rows.foreach { x =>
      val (lo, hi) = ranges(x.getLong(0))
      assert(x.getDouble(3) >= lo - 0.01 && x.getDouble(3) <= hi + 0.01,
        s"user ${x.getLong(0)}: twa ${x.getDouble(3)} outside [$lo, $hi]")
    }
  }

  test("q82/q83: trend deltas replay from the weekly series; transition rows sum to 1") {
    val wk = graft.operators.Relational4.q82PeriodOverPeriod(tables).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    // per type: exactly one first week (NULL prev), and every prev_n is
    // the previous week's n in ISO-string order
    wk.groupBy(_._1).foreach { case (tpe, rows) =>
      val ordered = rows.sortBy(_._2)
      assert(ordered.head._4.isEmpty, s"$tpe first week must have no prev")
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(b._4.contains(a._3), s"$tpe ${b._2} prev")
        case _ =>
      }
    }
    val tr = graft.operators.Relational4.q83TransitionMatrix(tables).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
    tr.groupBy(_._1).foreach { case (tpe, rows) =>
      val pSum = rows.map(_._3).sum
      assert(math.abs(pSum - 1.0) < 1e-4, s"$tpe transition row sums to $pSum")
      assert(rows.forall(_._2 > 0))
    }
  }

  test("q84: streaks conserve active days and replay brute-force per user") {
    val got = graft.operators.Relational5.q84Streaks(tables).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val days = tables.events
      .select(col("user_id"), col("ts").cast("date").as("day")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_.toEpochDay)).toMap
    assert(got.keySet === days.keySet)
    days.foreach { case (u, ds) =>
      // brute-force island split on the sorted day list
      val streaks = ds.tail.foldLeft(List(List(ds.head))) { (acc, d) =>
        if (d.toEpochDay == acc.head.head.toEpochDay + 1) (d :: acc.head) :: acc.tail
        else List(d) :: acc
      }
      val (active, n, longest) = got(u)
      assert(active === ds.size.toLong, s"user $u active days")
      assert(n === streaks.size.toLong, s"user $u streak count")
      assert(longest === streaks.map(_.size).max.toLong, s"user $u longest")
    }
  }

  test("q85: deciles partition each priority; sizes differ by ≤1; ranges are ordered") {
    val rows = graft.operators.Relational5.q85Deciles(tables).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val byPrio = rows.groupBy(_._1)
    val counts = tables.orders.groupBy(col("o_orderpriority")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    byPrio.foreach { case (prio, ds) =>
      assert(ds.map(_._3).sum === counts(prio), s"$prio: deciles conserve rows")
      assert(ds.map(_._3).max - ds.map(_._3).min <= 1, s"$prio: ntile balance")
      val ordered = ds.sortBy(_._2)
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(b._4 >= a._5, s"$prio: decile ${b._2} min ≥ prior max")
        case _ =>
      }
    }
  }

  test("q86: weighted median replays brute force per flag") {
    val got = graft.operators.Relational5.q86WeightedMedian(tables).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val li = tables.lineitem.select(col("l_returnflag"),
        round(col("l_extendedprice") * 100, 0).cast("long"),
        round(col("l_quantity"), 0).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    li.groupBy(_._1).foreach { case (flag, xs) =>
      val sorted = xs.map(x => (x._2, x._3)).sortBy(_._1)
      val tot = sorted.map(_._2).sum
      var cum = 0L
      val med = sorted.find { case (_, q) => cum += q; cum * 2 >= tot }.get._1
      assert(got(flag) === ((tot, med)), s"flag $flag")
    }
  }

  test("q87: skyline is exactly the non-dominated distinct point set") {
    val pts = tables.orders.select(col("o_orderpriority"),
        col("o_orderdate").cast("date"),
        round(col("o_totalprice") * 100, 0).cast("long")).distinct()
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay, r.getLong(2)))
    val got = graft.operators.Relational5.q87Skyline(tables).collect()
      .map(r => (r.getString(0), java.time.LocalDate.parse(r.getString(1)).toEpochDay, r.getLong(2)))
      .toSet
    def dominated(p: (String, Long, Long), q: (String, Long, Long)): Boolean =
      q._1 == p._1 && q._2 >= p._2 && q._3 <= p._3 && (q._2 > p._2 || q._3 < p._3)
    pts.foreach { p =>
      val isDom = pts.exists(q => dominated(p, q))
      assert(got.contains(p) === !isDom,
        s"$p: dominated=$isDom but frontier=${got.contains(p)}")
    }
  }

  test("q88: path counts replay a JVM regex over the ordered timeline") {
    val got = graft.operators.Relational5.q88PathPattern(tables).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    val ev = tables.events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    ev.groupBy(_._1).foreach { case (u, xs) =>
      val seq = xs.sortBy(x => (x._2.getTime, x._2.getNanos, x._3))
        .map(_._4.substring(0, 1)).mkString
      val n = "v[c]*p".r.findAllIn(seq).length
      assert(got(u) === ((seq.length, n)), s"user $u")
    }
  }

  test("q89: attribution conserves purchases and draws touches from real types") {
    val rows = graft.operators.Relational5.q89Attribution(tables).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val purchases = tables.events.where(col("event_type") === "purchase").count()
    assert(rows.map(_._2).sum === purchases, "every purchase attributed exactly once")
    val types = tables.events.select(col("event_type")).distinct()
      .collect().map(_.getString(0)).toSet + "(none)"
    assert(rows.map(_._1).forall(types.contains))
  }

  test("q90: histogram has 20 gapless bins conserving row count; extremes populated") {
    val rows = graft.operators.Relational5.q90Histogram(tables).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.keySet === (0L to 19L).toSet, "gapless bins")
    assert(rows.values.sum === tables.orders.count(), "conserves rows")
    assert(rows(0L) > 0 && rows(19L) > 0, "min and max land in the edge bins")
  }

  test("q91: attribution replays brute force; per-group credit is 1e6 minus floor loss") {
    val got = graft.operators.Relational5.q91LinearAttribution(tables).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val ev = tables.events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getTimestamp(1).getNanos, r.getLong(2), r.getString(3)))
    // JVM replay: running purchase count groups each user's timeline
    val credit = collection.mutable.Map[String, (Long, Long)]().withDefaultValue((0L, 0L))
    var groups = 0L
    ev.groupBy(_._1).foreach { case (_, xs) =>
      val ordered = xs.sortBy(x => (x._2, x._3, x._4))
      var conv = 0L
      val byGroup = ordered.map { x => val g = conv; if (x._5 == "purchase") conv += 1; (g, x._5) }
      byGroup.groupBy(_._1).foreach { case (g, es) =>
        if (es.exists(_._2 == "purchase")) {
          val touches = es.filter(_._2 != "purchase")
          if (touches.nonEmpty) {
            groups += 1
            val per = 1000000L / touches.length
            touches.groupBy(_._2).foreach { case (tpe, ts) =>
              val (n, c) = credit(tpe)
              credit(tpe) = (n + ts.length, c + ts.length * per)
            }
          }
        }
      }
    }
    assert(got === credit.toMap, "per-type totals replay")
    assert(got.values.map(_._2).sum <= groups * 1000000L,
      "no converted group can pay more than its 1e6 micro-units")
  }

  test("q92: RFM scores are balanced quintiles monotone in their metrics") {
    val rows = graft.operators.Relational5.q92Rfm(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getInt(5), r.getInt(6), r.getString(7)))
    assert(rows.length.toLong ===
      tables.orders.select(col("o_custkey")).distinct().count())
    rows.foreach { case (_, _, _, _, rs, fs, ms, seg) =>
      assert(rs >= 1 && rs <= 5 && fs >= 1 && fs <= 5 && ms >= 1 && ms <= 5)
      assert(seg === s"$rs$fs$ms")
    }
    for ((score, key) <- Seq[(((Long, Long, Long, Long, Int, Int, Int, String)) => Int,
                              ((Long, Long, Long, Long, Int, Int, Int, String)) => (Long, Long))](
        (_._5, x => (x._2, x._1)),          // recency asc
        (_._6, x => (-x._3, x._1)),         // frequency desc
        (_._7, x => (-x._4, x._1)))) {      // monetary desc
      val ordered = rows.sortBy(key)
      assert(ordered.map(score).sliding(2).forall {
        case Array(a, b) => a <= b; case _ => true }, "scores monotone in metric order")
      val sizes = rows.groupBy(score).values.map(_.size)
      assert(sizes.max - sizes.min <= 1, "quintile balance")
    }
  }

  test("q93: affinity pairs replay brute force incl. the lift arithmetic") {
    val got = graft.operators.Relational5.q93BasketAffinity(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    val items = tables.lineitem.select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = items.map(_._1).distinct.length.toLong
    val sup = items.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val co = items.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val exp = co.toSeq.map { case ((p1, p2), c) =>
      val lift = BigDecimal(c * n / (sup(p1) * sup(p2)).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (p1, p2, c, sup(p1), sup(p2), lift)
    }.sortBy(x => (-x._3, x._1, x._2)).take(50)
    assert(got.sortBy(x => (-x._3, x._1, x._2)) === exp)
  }

  test("q94: banded self-join equals the naive all-pairs-in-window replay") {
    val got = graft.operators.Relational5.q94RapidRepeats(tables).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val ev = tables.events
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val win = 3600000000L
    val pairs = ev.groupBy(x => (x._1, x._2)).values.flatMap { arr =>
      val es = arr.toSeq
      for {
        a <- es; b <- es
        if (b._4 - a._4 > 0 && b._4 - a._4 <= win) ||
          (b._4 == a._4 && a._3 < b._3)
      } yield (a._2, b._3, b._4 - a._4)
    }.toSeq
    val exp = pairs.groupBy(_._1).view.mapValues(ps =>
      (ps.size.toLong, ps.map(_._2).distinct.size.toLong, ps.map(_._3).min)).toMap
    assert(got === exp)
  }

  test("q95: median/MAD/outlier counts replay a JVM sort per flag") {
    val got = graft.operators.Relational5.q95RobustOutliers(tables).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    val li = tables.lineitem.select(col("l_returnflag"),
        round(col("l_extendedprice") * 100, 0).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def q50(xs: Seq[Double]): Double = {
      val s = xs.sorted; val idx = (s.length - 1) * 0.5
      val lo = s(idx.toInt)
      if (idx == idx.toInt) lo else lo + (idx - idx.toInt) * (s(idx.toInt + 1) - lo)
    }
    li.groupBy(_._1).foreach { case (flag, xs) =>
      val med = q50(xs.map(_._2.toDouble))
      val adev = xs.map(x => math.abs(x._2 - med))
      val mad = q50(adev)
      val outliers = adev.count(_ > mad * 3 * 1.4826).toLong
      val (gm, gmad, gn) = got(flag)
      assert(gm === med, s"$flag median")
      assert(gmad === BigDecimal(mad).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        s"$flag mad")
      assert(gn === outliers, s"$flag outliers")
    }
  }

  test("q96: digit counts replay; ppm shares conserve up to flooring") {
    val got = graft.operators.Relational5.q96Benford(tables).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val digits = tables.orders
      .select(round(col("o_totalprice") * 100, 0).cast("long")).collect()
      .map(_.getLong(0).toString.charAt(0).asDigit)
    val exp = digits.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = digits.length.toLong
    assert(got.view.mapValues(_._1).toMap === exp)
    got.foreach { case (d, (n, ppm)) =>
      assert(d >= 1 && d <= 9)
      assert(ppm === n * 1000000L / total, s"digit $d ppm")
    }
    val ppmSum = got.values.map(_._2).sum
    assert(ppmSum <= 1000000L && ppmSum > 1000000L - got.size.toLong,
      "shares conserve up to one floor unit per digit")
  }

  test("q97: crosstab margins and chi-square terms replay from raw counts") {
    val rows = graft.operators.Relational5.q97CrosstabChi2(tables).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))).toMap
    val raw = tables.orders.select(col("o_orderpriority"), col("o_orderstatus"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val cells = raw.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rowN = raw.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val colN = raw.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val total = raw.length.toLong
    assert(rows.keySet === cells.keySet)
    cells.foreach { case (k @ (p, s), n) =>
      val (gn, grn, gcn, ge, gchi) = rows(k)
      assert((gn, grn, gcn) === ((n, rowN(p), colN(s))), s"$k margins")
      val e = rowN(p) * colN(s) / total.toDouble
      assert(ge === e, s"$k expected")
      assert(gchi === BigDecimal((n - e) * (n - e) / e)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, s"$k chi2")
    }
  }

  test("q98: compaction replays latest-wins with tombstones in the JVM") {
    val got = graft.operators.Relational5.q98CdcCompact(tables).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getLong(3)))).toMap
    val log = tables.lineitem.select(col("l_orderkey"),
        col("l_linenumber").cast("long"), col("l_partkey"),
        round(col("l_extendedprice") * 100, 0).cast("long"))
      .collect().map { r =>
        val op = if (r.getLong(2) % 11 == 0) "D"
          else if (r.getLong(1) == 1L) "I" else "U"
        (r.getLong(0), r.getLong(1), op, r.getLong(3))
      }
    val latest = log.groupBy(_._1).view.mapValues(
      _.maxBy(x => (x._2, x._4, -x._3.charAt(0).toInt))).toMap
    val exp = latest.filter(_._2._3 != "D")
      .map { case (k, (_, v, op, c)) => k -> ((v, op, c)) }.toMap
    assert(got === exp)
    assert(latest.exists(_._2._3 == "D"), "tombstones actually occur in the log")
  }

  test("q99: SCD2 intervals tile each customer's history with one open row") {
    val rows = graft.operators.Relational5.q99Scd2(tables).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3),
        Option(r.getString(4)), r.getBoolean(5)))
    val orders = tables.orders.select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date"), col("o_orderpriority"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDate(2).toLocalDate, r.getString(3)))
    rows.groupBy(_._1).foreach { case (cust, ivs) =>
      val hist = orders.filter(_._1 == cust).sortBy(x => (x._3.toEpochDay, x._2))
      assert(ivs.map(_._3).sum === hist.length.toLong, s"$cust orders conserved")
      assert(ivs.count(_._6) === 1, s"$cust exactly one current interval")
      val ordered = ivs.sortBy(_._4)
      assert(ordered.head._4 === hist.head._3.toString, s"$cust first interval start")
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5.contains(b._4), s"$cust intervals must tile (no gap/overlap)")
          assert(a._2 !== b._2, s"$cust adjacent intervals must change value")
        case _ =>
      }
      assert(ordered.last._5.isEmpty && ordered.last._6, s"$cust open current row")
      // each interval's value is the history's value at its start
      val byDay = hist.map(h => (h._3.toString, h._4))
      ordered.foreach { iv =>
        assert(byDay.find(_._1 == iv._4).exists(_._2 == iv._2) ||
          hist.exists(h => h._3.toString == iv._4 && h._4 == iv._2),
          s"$cust interval at ${iv._4} value ${iv._2}")
      }
    }
  }

  test("q100: trailing 7-day window replays a JVM two-pointer scan per user") {
    val got = graft.operators.Relational5.q100TrailingWindow(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val ev = tables.events.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")), round(col("value") * 100, 0).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val week = 7L * 86400L * 1000000L
    ev.groupBy(_._1).foreach { case (_, xs) =>
      xs.foreach { e =>
        val inWin = xs.filter(o => o._3 >= e._3 - week && o._3 <= e._3)
        val (gts, gn, gsum) = got((e._1, e._2))
        assert(gts === e._3)
        assert(gn === inWin.length.toLong, s"event ${e._2} count")
        assert(gsum === inWin.map(_._4).sum, s"event ${e._2} sum")
      }
    }
  }

  test("q101: bounce rate replays a JVM session split; q24 session counts agree") {
    val got = graft.operators.Relational5.q101BounceRate(tables).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val ev = tables.events.select(col("user_id"), col("event_id"),
        unix_micros(col("ts"))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gap = 1800000000L
    ev.groupBy(_._1).foreach { case (u, xs) =>
      val ts = xs.sortBy(x => (x._3, x._2))
      val sessions = ts.tail.foldLeft(List(List(ts.head))) { (acc, e) =>
        if (e._3 - acc.head.head._3 > gap) List(e) :: acc
        else (e :: acc.head) :: acc.tail
      }
      val n = sessions.size.toLong
      val b = sessions.count(_.size == 1).toLong
      assert(got(u) === ((n, b, b * 1000000L / n)), s"user $u")
    }
    // session COUNTS agree with q24's session_window at the same timeout
    val q24 = graft.operators.Temporal.q24Sessionize(tables).collect()
      .map(_.getLong(0)).groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(got.view.mapValues(_._1).toMap === q24,
      "island sessions ≡ session_window sessions")
  }

  test("q102: spine is gapless, conserves orders, and flags exactly the zero days") {
    val rows = graft.operators.Relational5.q102DateSpine(tables).collect()
      .map(r => (java.time.LocalDate.parse(r.getString(0)), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1.toEpochDay)
    val days = rows.map(_._1)
    assert(days.head.toEpochDay.to(days.last.toEpochDay).size === rows.length,
      "one row per calendar day, no holes")
    days.sliding(2).foreach {
      case Array(a, b) => assert(b.toEpochDay === a.toEpochDay + 1)
      case _ =>
    }
    assert(rows.map(_._2).sum === tables.orders.count(), "order mass conserved")
    rows.foreach { case (d, n, gap) =>
      assert(gap === (n == 0L), s"$d gap flag")
    }
    assert(!rows.head._3 && !rows.last._3, "range endpoints are observed days")
  }

  test("q104: DAU/WAU replay a JVM trailing-set scan; laws hold") {
    val got = graft.operators.Relational5.q104RollingActives(tables).collect()
      .map(r => java.time.LocalDate.parse(r.getString(0)) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val du = tables.events.select(col("ts").cast("date"), col("user_id")).distinct()
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val byDay = du.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got.keySet === byDay.keySet, "one row per observed day")
    byDay.foreach { case (d, users) =>
      val wauSet = (0 to 6).flatMap(i => byDay.getOrElse(d.minusDays(i), Set.empty)).toSet
      val (dau, wau, ppm) = got(d)
      assert(dau === users.size.toLong, s"$d dau")
      assert(wau === wauSet.size.toLong, s"$d wau")
      assert(ppm === dau * 1000000L / wau, s"$d stickiness")
      assert(dau <= wau, s"$d dau ≤ wau")
    }
  }

  test("q108: recency replays a JVM dyadic fold; bounds hold") {
    val got = graft.operators.Relational5.q108Recency(tables).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getLong(3)))).toMap
    val ev = tables.events.select(col("user_id"), col("ts").cast("date")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val anchor = ev.map(_._2).maxBy(_.toEpochDay)
    val byUser = ev.groupBy(_._1)
    assert(got.keySet === byUser.keySet, "one row per user")
    byUser.foreach { case (u, rows) =>
      val days = rows.map(_._2)
      val score = days.map { d =>
        1048576L >> math.min(anchor.toEpochDay - d.toEpochDay, 20L).toInt
      }.sum
      val (n, last, s) = got(u)
      assert(n === rows.size.toLong, s"user $u n_events")
      assert(last === days.maxBy(_.toEpochDay).toString, s"user $u last_seen")
      assert(s === score, s"user $u recency")
      assert(s >= n && s <= n * 1048576L, s"user $u term bounds (floor 1, cap 2^20)")
    }
  }

  test("q109: trigrams replay a JVM sliding count; ranks are total") {
    val got = graft.operators.Relational5.q109PathTrigrams(tables).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val counts = tables.events
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)), r.getString(3)))
      .groupBy(_._1).values.flatMap { rows =>
        rows.sortBy(r => r._2).map(_._3).sliding(3).filter(_.size == 3)
          .map(_.mkString(">"))
      }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = counts.toSeq.sortBy { case (t, n) => (-n, t) }.take(20)
      .zipWithIndex.map { case ((t, n), i) => (i + 1, t, n) }
    assert(got.sortBy(_._1) === expected, "top-20 with deterministic ties")
    assert(got.map(_._1).sorted === (1 to got.size), "gapless rank sequence")
  }

  test("q110: debounce replays the JVM greedy chain; gap monotonicity holds") {
    def run(gap: Long) =
      graft.operators.Relational5.q110Debounce(tables, gap).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val got = run(3600L)
    val byUser = tables.events
      .select(col("user_id"), unix_micros(col("ts"))).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    assert(got.keySet === byUser.keySet)
    byUser.foreach { case (u, rows) =>
      val us = rows.map(_._2).sorted
      val kept = us.foldLeft((Long.MinValue / 2, 0L)) { case ((last, n), x) =>
        if (x >= last + 3600000000L) (x, n + 1) else (last, n)
      }._2
      val (ni, nk, ppm) = got(u)
      assert(ni === us.length.toLong, s"user $u instants")
      assert(nk === kept, s"user $u greedy chain")
      assert(nk >= 1L && nk <= ni, s"user $u bounds")
      assert(ppm === nk * 1000000L / ni, s"user $u ppm identity")
    }
    val wider = run(24 * 3600L)
    got.keySet.foreach { u =>
      assert(wider(u)._2 <= got(u)._2, s"user $u: wider gap keeps fewer")
    }
  }

  test("q111: reconciliation counts matches, mismatches and both orphan kinds") {
    import SparkTestSession.spark.implicits._
    val orders = Seq(
      (1L, "F", 99.0),      // reconciles exactly: 100.00·0.99·1.00 = 99.00
      (2L, "F", 50.00),     // header off by 1 cent from billed 50.01
      (3L, "O", 10.00)      // no lines
    ).toDF("o_orderkey", "o_orderstatus", "o_totalprice")
    val lines = Seq(
      (1L, 100.00, 0.01, 0.00),
      (2L, 49.02, 0.00, 0.02),  // 4902·100·102/10000 = 5000.04 → 5000 cents
      (2L, 0.01, 0.00, 0.00),   // +1 cent → billed 5001
      (4L, 20.00, 0.00, 0.00)   // headerless order
    ).toDF("l_orderkey", "l_extendedprice", "l_discount", "l_tax")
    val got = graft.operators.Relational5.reconcile(orders, lines).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got("F") === ((2L, 0L, 1L, 9900L + 5001L, 9900L + 5000L, 1L)),
      "order 1 exact, order 2 one cent short")
    assert(got("O") === ((1L, 1L, 0L, 0L, 1000L, 1000L)), "line-less order")
    assert(got("(no_header)") === ((1L, 0L, 0L, 2000L, 0L, 2000L)),
      "headerless lines surface")
  }

  test("q112: z replays the JVM formula bit-for-bit; degenerate pools are NULL") {
    def md5Hash60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val r = graft.operators.Relational5.q112AbTest(tables).collect().head
    val (na, xa, nb, xb) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val units = tables.events
      .select(col("user_id"), col("ts").cast("date"),
        (col("event_type") === "purchase").cast("long")).collect()
      .map(row => ((row.getLong(0), row.getDate(1).toLocalDate), row.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).max == 1L).toMap
    val (ena, exa, enb, exb) = units.foldLeft((0L, 0L, 0L, 0L)) {
      case ((a, va, b, vb), ((u, _), conv)) =>
        if (md5Hash60(s"ab:$u") % 2 == 0)
          (a + 1, va + (if (conv) 1 else 0), b, vb)
        else (a, va, b + 1, vb + (if (conv) 1 else 0))
    }
    assert((na, xa, nb, xb) === ((ena, exa, enb, exb)), "unit counts")
    assert(r.getLong(4) === xa * 1000000L / na, "rate_a ppm")
    assert(r.getLong(5) === xb * 1000000L / nb, "rate_b ppm")
    val p = (xa + xb).toDouble / (na + nb)
    val zExp = (xa.toDouble / na - xb.toDouble / nb) /
      math.sqrt(p * (1.0d - p) * (1.0d / na + 1.0d / nb))
    assert(java.lang.Double.doubleToLongBits(r.getDouble(6)) ===
      java.lang.Double.doubleToLongBits(zExp), "bit-identical IEEE z")
    import SparkTestSession.spark.implicits._
    val saturated = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "purchase"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val deg = graft.operators.Relational5.abTest(saturated).collect().head
    assert(deg.isNullAt(6), "pooled rate 1 has zero variance -> NULL, not an error")
  }

  test("q113: U-shaped credits replay the JVM rule; conservation up to truncation") {
    val got = graft.operators.Relational5.q113PositionAttribution(tables).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    val ev = tables.events
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val groups = ev.groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      val convId = sorted.scanLeft(0L)((acc, r) =>
        acc + (if (r._4 == "purchase") 1 else 0)).init
      val byConv = sorted.zip(convId).groupBy(_._2)
      val convertedIds = sorted.zip(convId)
        .filter(_._1._4 == "purchase").map(_._2).toSet
      byConv.filter { case (cid, g) =>
        convertedIds.contains(cid) && g.exists(_._1._4 != "purchase")
      }.values.map(_.map(_._1).filter(_._4 != "purchase"))
    }.toSeq
    var exp = Map.empty[String, (Long, Long, Long, Long)].withDefaultValue((0L, 0L, 0L, 0L))
    var truncated = 0L
    groups.foreach { g =>
      val n = g.size
      g.zipWithIndex.foreach { case (r, i) =>
        val credit =
          if (n == 1) 1000000L
          else if (n == 2) 500000L
          else if (i == 0 || i == n - 1) 400000L
          else 200000L / (n - 2)
        val (t0, f0, l0, c0) = exp(r._4)
        exp += r._4 -> ((t0 + 1, f0 + (if (i == 0) 1L else 0L),
          l0 + (if (i == n - 1) 1L else 0L), c0 + credit))
      }
      if (n > 2) truncated += 200000L - (n - 2).toLong * (200000L / (n - 2))
    }
    assert(got === exp, "per-type counters replay the JVM 40/20/40 rule")
    val totalCredit = got.values.map(_._4).sum
    assert(totalCredit + truncated === groups.size.toLong * 1000000L,
      "credit conserves up to the declared integer truncation")
  }

  test("q114: the prefix-min closed form equals the naive sequential clamp") {
    val got = graft.operators.Relational5.q114ClampedBalance(tables).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    val daily = tables.lineitem
      .select(col("l_partkey"), col("l_shipdate").cast("date"),
        when(col("l_returnflag") === "R", expr("CAST(l_quantity AS BIGINT)"))
          .otherwise(-expr("CAST(l_quantity AS BIGINT)"))).collect()
      .map(r => ((r.getLong(0), r.getDate(1).toLocalDate), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .map { case ((part, day), delta) => (part, day, delta) }
      .groupBy(_._1)
    assert(got.keySet === daily.keySet)
    daily.foreach { case (part, rows) =>
      var bal = 0L; var stockouts = 0L; var shortfall = 0L
      var peak = 0L; var n = 0L
      rows.sortBy(_._2.toEpochDay).foreach { case (_, _, delta) =>
        n += 1
        val next = bal + delta
        if (next < 0) { stockouts += 1; shortfall += -next; bal = 0L }
        else bal = next
        if (bal > peak) peak = bal
      }
      assert(got(part) === ((n, stockouts, peak, bal, shortfall)),
        s"part $part: closed form must equal the sequential replay")
    }
  }

  test("q115: session baskets replay a JVM sessionize+pairs; lift identity holds") {
    val got = graft.operators.Relational5.q115SessionAffinity(tables).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    val ev = tables.events
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val baskets = ev.groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      val sessions = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.Set.empty[String])
      var prev = Long.MinValue
      sorted.foreach { r =>
        if (prev != Long.MinValue && r._2 - prev > 1800000000L)
          sessions += scala.collection.mutable.Set.empty[String]
        sessions.last += r._4; prev = r._2
      }
      sessions.map(_.toSet)
    }.toSeq
    val nSessions = baskets.size.toLong
    val support = baskets.flatten.groupBy(identity).view.mapValues(_.size.toLong)
    val expPairs = baskets.flatMap(b =>
      b.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got.keySet === expPairs.keySet, "pair universe")
    expPairs.foreach { case (key @ (a, b), co) =>
      val (gco, s1, s2, n, lift) = got(key)
      assert(gco === co, s"$key co")
      assert(s1 === support(a) && s2 === support(b), s"$key supports")
      assert(n === nSessions, s"$key session count")
      assert(lift === co * nSessions * 1000000L / (s1 * s2), s"$key lift identity")
    }
  }

  test("q116: banded overlap join replays the naive JVM join, never a cartesian") {
    val df = graft.operators.Relational5.q116OverlapJoin(tables)
    val got = df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val ev = tables.events
      .select(col("event_id"), unix_micros(col("ts")), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val views = ev.filter(_._3 == "view")
      .map(r => (r._1, r._2, r._2 + (60L + r._1 % 240) * 1000000L))
    val incidents = ev.filter(_._3 == "error")
      .map(r => (r._2, r._2 + 600000000L))
    val exp = views.map { case (id, s1, e1) =>
      val over = incidents.filter { case (s2, e2) => s1 < e2 && s2 < e1 }
        .map { case (s2, e2) => math.min(e1, e2) - math.max(s1, s2) }
      id -> ((over.size.toLong, over.sum))
    }.toMap
    assert(got === exp, "banded join must equal the naive overlap join")
    assert(got.values.exists(_._1 > 0L), "fixture has overlapping pairs")
    val p = SparkTestSession.finalPlan(df)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"the overlap join must band on buckets, not cross-product:\n$p")
  }

  test("q117: features replay a JVM trailing scan and never see the label instant") {
    val got = graft.operators.Relational5.q117TrainingAssembly(tables).collect()
      .map(r => r.getLong(1) -> ((r.getLong(0), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))).toMap
    val ev = tables.events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts"))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byUser = ev.groupBy(_._1)
    val win = 7L * 86400L * 1000000L
    val labels = ev.filter(_._3 == "purchase")
    assert(got.keySet === labels.map(_._2).toSet, "one row per purchase")
    labels.foreach { case (u, id, _, us) =>
      val prior = byUser(u).filter(e => e._4 >= us - win && e._4 < us)
      def n(tpe: String) = prior.count(_._3 == tpe).toLong
      assert(got(id) === ((u, n("view"), n("click"), n("error"), n("purchase"))),
        s"label $id trailing-window replay")
    }
    // the replay's `< us` bound excluded each label's own instant; the
    // equality above therefore proves the engine's frame did too
    assert(got.values.exists(_._5 > 0L), "fixture exercises repeat purchasers")
  }

  test("q118: KM curve replays a JVM product-limit fold; survival is monotone") {
    val got = graft.operators.Relational5.q118SurvivalCurve(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    val ev = tables.events
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")),
        col("ts").cast("date")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDate(3).toLocalDate))
    val horizon = ev.map(_._4).maxBy(_.toEpochDay)
    val subs = ev.groupBy(_._1).values.flatMap { rows =>
      val signups = rows.filter(_._2 == "signup")
      if (signups.isEmpty) None else {
        val s = signups.minBy(_._3)
        val conv = rows.filter(r => r._2 == "purchase" && r._3 >= s._3)
        if (conv.nonEmpty) {
          val p = conv.minBy(_._3)
          Some((p._4.toEpochDay - s._4.toEpochDay, true))
        } else Some((horizon.toEpochDay - s._4.toEpochDay, false))
      }
    }.toSeq
    var atRisk = subs.size.toLong
    var surv = 1.0
    val exp = subs.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (dur, g) =>
      val d = g.count(_._2).toLong
      val row = if (d > 0) {
        val r = (dur, atRisk, d,
          if (d == atRisk) 0.0
          else { surv *= (1.0 - d.toDouble / atRisk); surv })
        Some(r)
      } else None
      atRisk -= g.size
      row
    }
    assert(got.map(r => (r._1, r._2, r._3)) === exp.map(r => (r._1, r._2, r._3)),
      "event times, risk sets and event counts replay")
    got.zip(exp).foreach { case ((_, _, _, gs), (_, _, _, es)) =>
      assert(math.abs(gs - es) < 2e-6, "survival within rounding of the JVM fold")
    }
    val ss = got.map(_._4)
    assert(ss.zip(ss.drop(1)).forall { case (a, b) => b <= a + 1e-12 }, "monotone")
    assert(ss.forall(s => s >= 0.0 && s <= 1.0), "bounded")
  }

  test("q119: step transitions replay the JVM session walk; shares sum per step") {
    val got = graft.operators.Relational5.q119StepTransitions(tables).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    val ev = tables.events
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val exp = ev.groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._2, r._3)).toList
      val sessions = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer.empty[String])
      var prev = Long.MinValue
      sorted.foreach { r =>
        if (prev != Long.MinValue && r._2 - prev > 1800000000L)
          sessions += scala.collection.mutable.ArrayBuffer.empty[String]
        sessions.last += r._4; prev = r._2
      }
      sessions.flatMap(s => s.toSeq.zip(s.drop(1)).zipWithIndex
        .filter(_._2 < 5).map { case ((a, b), i) => (i + 1, a, b) })
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got.keySet === exp.keySet, "transition universe")
    val stepTotals = exp.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    exp.foreach { case (key, n) =>
      assert(got(key)._1 === n, s"$key count")
      assert(got(key)._2 === n * 1000000L / stepTotals(key._1), s"$key share")
    }
  }

  test("q112/q120: CUPED replays JVM moments; adjustment preserves the pooled mean") {
    def md5Hash60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val r = graft.operators.Relational5.q120Cuped(tables).collect().head
    val ev = tables.events
      .select(col("user_id"), unix_micros(col("ts")), col("event_type")).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2)))
    val lo = ev.map(_._2).min; val hi = ev.map(_._2).max
    val mid = lo + (hi - lo) / 2
    val users = ev.groupBy(_._1).map { case (u, rows) =>
      (u, rows.count(_._2 < mid).toDouble,
        rows.count(e => e._2 >= mid && e._3 == "purchase").toDouble)
    }.toSeq
    val n = users.size
    val xb = users.map(_._2).sum / n; val yb = users.map(_._3).sum / n
    val cov = users.map(u => (u._2 - xb) * (u._3 - yb)).sum / n
    val vx = users.map(u => (u._2 - xb) * (u._2 - xb)).sum / n
    val theta = math.rint(cov / vx * 1e6) / 1e6
    assert(math.abs(r.getDouble(6) - theta) < 2e-6, "theta replay")
    val xbr = math.rint(xb * 1e6) / 1e6
    def sideMeans(inA: Boolean) = {
      val g = users.filter(u => (md5Hash60(s"ab:${u._1}") % 2 == 0) == inA)
      (g.map(_._3).sum / g.size,
        g.map(u => u._3 - theta * (u._2 - xbr)).sum / g.size)
    }
    val (rawA, adjA) = sideMeans(true); val (rawB, adjB) = sideMeans(false)
    assert(math.abs(r.getDouble(2) - rawA) < 2e-6 &&
      math.abs(r.getDouble(3) - rawB) < 2e-6, "raw means replay")
    assert(math.abs(r.getDouble(4) - adjA) < 2e-6 &&
      math.abs(r.getDouble(5) - adjB) < 2e-6, "adjusted means replay")
    val nA = r.getLong(0); val nB = r.getLong(1)
    val pooledRaw = (r.getDouble(2) * nA + r.getDouble(3) * nB) / (nA + nB)
    val pooledAdj = (r.getDouble(4) * nA + r.getDouble(5) * nB) / (nA + nB)
    assert(math.abs(pooledRaw - pooledAdj) < 1e-4,
      "CUPED must not move the pooled mean (Σ(x−x̄) = 0)")
  }

  test("q121: gap buckets replay the JVM log2 rule; shares sum per type") {
    val got = graft.operators.Relational5.q121GapSpectrum(tables).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val ev = tables.events
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")),
        col("event_id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val exp = ev.groupBy(r => (r._1, r._2)).values.flatMap { rows =>
      val s = rows.sortBy(r => (r._3, r._4))
      s.zip(s.drop(1)).map { case (a, b) =>
        val gapS = (b._3 - a._3) / 1000000L
        val bucket = if (gapS <= 0) 0 else 64 - java.lang.Long.numberOfLeadingZeros(gapS)
        (b._2, bucket)
      }
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got.keySet === exp.keySet, "bucket universe")
    val totals = exp.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    exp.foreach { case (key, n) =>
      assert(got(key) === ((n, n * 1000000L / totals(key._1))), s"$key")
    }
  }

  test("q80: the NOT IN null trap fires; EXISTS forms agree with IN") {
    val r = graft.operators.Relational4.q80NullMembership(tables).collect().head
    val (notIn, notExists, isIn, exists) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(notIn === 0L, "x NOT IN (…, NULL) is UNKNOWN for every x")
    assert(notExists > 0L, "NOT EXISTS returns the real complement")
    assert(isIn === exists, "positive membership is null-immune")
    assert(isIn + notExists === tables.customer.count(),
      "IN + NOT EXISTS partition the probe side")
  }
}
