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
}
