package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator surface (SURVEY.md §2.3).
  *
  * The reference implements none of these — filters/joins/aggregations live
  * inside the opaque user script it schedules (e.g. reference
  * `examples/tensorflow/dataDeal.py:1-40` hand-parses CSV lines). Each method
  * here is one declared operator of the new engine, expressed as a declarative
  * DataFrame plan so Catalyst provides pushdown, pruning, partial aggregation,
  * join selection and whole-stage codegen.
  *
  * Scale conventions used throughout:
  *   - dimension tables (region/nation/customer at TPC-H proportions) are
  *     broadcast explicitly where the stats may not be visible to Catalyst;
  *   - aggregations are keyed groupBy (map-side partial agg is automatic);
  *   - top-k is orderBy+limit (planned as TakeOrderedAndProject — no global
  *     sort materialization);
  *   - every output column is aliased explicitly for oracle comparison.
  */
object Relational {

  private def dec(c: Column, s: Int = 2): Column = round(c, s)

  /** q01: full-table hash aggregation, TPC-H Q1 family.
    * Partial+final agg split is Catalyst's; one shuffle on the 2 group keys. */
  def q01Agg(t: Tables): DataFrame =
    t.lineitem
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dec(sum("l_quantity")).as("sum_qty"),
        dec(sum("l_extendedprice")).as("sum_base_price"),
        dec(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
        dec(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))).as("sum_charge"),
        dec(avg("l_quantity"), 4).as("avg_qty"),
        dec(avg("l_extendedprice"), 4).as("avg_price"),
        dec(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** q02: projection + conjunctive filter; predicates and the 4-column read
    * schema are pushed into the parquet scan (verify via PushedFilters). */
  def q02FilterProject(t: Tables): DataFrame =
    t.lineitem
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") <  lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        // raw IEEE product — bit-identical across engines, unlike round()
        (col("l_extendedprice") * col("l_discount")).as("disc_revenue"))

  /** q03: 3-way join (fact ⋈ fact ⋈ dim) + agg. customer is small relative to
    * orders/lineitem → broadcast; orders⋈lineitem shuffles on orderkey once. */
  def q03JoinAgg(t: Tables): DataFrame =
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
      .groupBy(col("c_mktsegment"))
      .agg(
        dec(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"))

  /** q04: left outer join preserving customers with no orders; agg over the
    * nullable side. Null join keys stay on their row (outer semantics). */
  def q04LeftJoin(t: Tables): DataFrame =
    t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_nationkey"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        sum(when(col("o_orderkey").isNull, 1).otherwise(0)).as("n_customers_no_order"),
        dec(coalesce(sum("o_totalprice"), lit(0.0))).as("total_spend"))

  /** q05: full outer join + null-safe handling on both sides. Joins the
    * per-nation customer and supplier counts. */
  def q05FullOuter(t: Tables): DataFrame = {
    val c = t.customer.groupBy(col("c_nationkey").as("nationkey")).agg(count(lit(1)).as("n_cust"))
    val s = t.supplier.groupBy(col("s_nationkey").as("nationkey")).agg(count(lit(1)).as("n_supp"))
    c.join(s, Seq("nationkey"), "full")
      .select(
        col("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
  }

  /** q06: left-semi join (EXISTS) — customers that have at least one
    * high-value order, counted per segment. Semi join shuffles only the keys
    * of the probe side; no row duplication. */
  def q06SemiJoin(t: Tables): DataFrame =
    t.customer
      .join(
        t.orders.filter(col("o_totalprice") > 150000).select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))

  /** q07: left-anti join (NOT EXISTS) — customers with no high-value order. */
  def q07AntiJoin(t: Tables): DataFrame =
    t.customer
      .join(t.orders.filter(col("o_totalprice") > 300000).select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"), dec(sum("c_acctbal")).as("acctbal"))

  /** q08: ranking window — top-3 orders per customer by totalprice.
    * Single shuffle on the partition key; ties broken by orderkey so the
    * result is deterministic. */
  def q08WindowRank(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t.orders
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("rk"), col("o_orderkey"), dec(col("o_totalprice")).as("totalprice"))
  }

  /** q09: running / offset windows — cumulative revenue and previous-order
    * gap per customer ordered by date (deterministic tiebreak on orderkey). */
  def q09WindowRunning(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    t.orders.select(
      col("o_custkey"),
      col("o_orderkey"),
      dec(sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0))).as("running_spend"),
      lag(col("o_orderkey"), 1).over(w).as("prev_orderkey"),
      row_number().over(w).as("order_seq"))
  }

  /** q10: top-k — planned as TakeOrderedAndProject (per-partition heap + driver
    * merge of k rows), not a global sort; the pattern that survives 100 TB. */
  def q10TopK(t: Tables): DataFrame =
    t.orders
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"), dec(col("o_totalprice")).as("totalprice"))

  /** q11: set operators union / intersect / except over key sets, tagged so a
    * single result exercises all three. */
  def q11SetOps(t: Tables): DataFrame = {
    // union/intersect/except as ONE aggregation: tag each side, collapse to
    // per-key membership flags, then derive each op's rows from the flags.
    // The naive form (3 distincts + intersect + except over re-scanned
    // inputs) shuffles the key set 3+ times; this shuffles it once — at
    // 100 TB the difference between one exchange over |keys| and a chain of
    // them. Result is row-identical to the set-op formulation.
    val bigSpenders  = t.orders.filter(col("o_totalprice") > 200000)
      .select(col("o_custkey").as("custkey"), lit(1).as("src"))
    val richAccounts = t.customer.filter(col("c_acctbal") > 5000)
      .select(col("c_custkey").as("custkey"), lit(2).as("src"))
    bigSpenders.union(richAccounts)
      .groupBy(col("custkey"))
      .agg(max(when(col("src") === 1, 1).otherwise(0)).as("in_big"),
        max(when(col("src") === 2, 1).otherwise(0)).as("in_rich"))
      .select(col("custkey"), explode(concat(
        array(lit("union")), // every surviving key is in the union
        when(col("in_big") === 1 && col("in_rich") === 1, array(lit("intersect")))
          .otherwise(array().cast("array<string>")),
        when(col("in_big") === 1 && col("in_rich") === 0, array(lit("except")))
          .otherwise(array().cast("array<string>")))).as("op"))
      .select(col("op"), col("custkey"))
  }

  /** q12: CUBE over two keys with grouping() disambiguation of the generated
    * nulls. */
  def q12Cube(t: Tables): DataFrame =
    t.lineitem
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).cast("int").as("g_flag"),
        grouping(col("l_linestatus")).cast("int").as("g_status"),
        dec(sum("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n"))

  /** q13: ROLLUP over the nation→region hierarchy (dims broadcast). */
  def q13Rollup(t: Tables): DataFrame =
    t.customer
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        grouping(col("r_name")).cast("int").as("g_region"),
        grouping(col("n_name")).cast("int").as("g_nation"),
        count(lit(1)).as("n_cust"),
        dec(sum("c_acctbal")).as("acctbal"))

  /** q14: distinct / exact count-distinct per group. (approx_count_distinct —
    * the HLL++ scale path — is exercised in tests; its output is
    * implementation-defined so it gets no SQL oracle.) */
  def q14Distinct(t: Tables): DataFrame =
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))

  /** q15: string function battery on part — substring/split/regexp/concat/
    * levenshtein, all codegen'd built-ins (no UDFs). */
  def q15Strings(t: Tables): DataFrame =
    t.part.select(
      col("p_partkey"),
      upper(substring(col("p_name"), 1, 4)).as("prefix4"),
      length(col("p_name")).as("name_len"),
      size(split(col("p_name"), " ")).as("n_words"),
      regexp_extract(col("p_type"), "^(\\w+)", 1).as("type_head"),
      concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
      levenshtein(col("p_brand"), lit("Brand#11")).as("lev_to_b11"))

  /** q16: date/time functions — truncation, extraction, day arithmetic. */
  def q16Datetime(t: Tables): DataFrame =
    t.orders
      .groupBy(
        year(col("o_orderdate")).as("yr"),
        quarter(col("o_orderdate")).as("qtr"))
      .agg(
        count(lit(1)).as("n_orders"),
        dec(sum("o_totalprice")).as("total"),
        max(datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date"))).as("max_age_days"))

  /** q17: conditional expressions — CASE buckets, null-safe equality, nullif/
    * coalesce. */
  def q17CaseNull(t: Tables): DataFrame =
    t.customer
      .select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, "debt")
          .when(col("c_acctbal") < 5000, "low")
          .otherwise("high").as("bal_bucket"),
        (col("c_nationkey") <=> lit(3)).as("is_nation3"),
        coalesce(nullif(col("c_mktsegment"), lit("MACHINERY")), lit("OTHER")).as("seg_or_other"))
      .groupBy(col("bal_bucket"), col("is_nation3"), col("seg_or_other"))
      .agg(count(lit(1)).as("n"))

  /** q18: array ops — split → explode → frequency count (word histogram over
    * part names). explode is a generator (no shuffle); the count is one agg. */
  def q18ArrayExplode(t: Tables): DataFrame =
    t.part
      .select(explode(split(lower(col("p_name")), " ")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))

  /** q19: JSON extraction from the events.props string column (codegen'd
    * get_json_object, not a UDF), aggregated per event type. */
  def q19Json(t: Tables): DataFrame =
    t.events
      .select(
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum("k").as("sum_k"),
        min("k").as("min_k"),
        max("k").as("max_k"))

  /** q20: HAVING over a scalar subquery — segments whose average order value
    * exceeds the global average. The scalar agg is broadcast (1 row). */
  def q20HavingSubquery(t: Tables): DataFrame = {
    val global = t.orders.agg(avg("o_totalprice").as("global_avg"))
    t.orders
      .groupBy(col("o_orderpriority"))
      .agg(dec(avg("o_totalprice"), 4).as("avg_price"), count(lit(1)).as("n"))
      .crossJoin(broadcast(global))
      .filter(col("avg_price") > col("global_avg"))
      .select(col("o_orderpriority"), col("avg_price"), col("n"))
  }

  /** q21: correlated EXISTS via the SQL surface (Catalyst decorrelates to a
    * semi join) — suppliers from nations that have customers with debt. */
  def q21ExistsSql(t: Tables): DataFrame = {
    t.registerViews()
    t.spark.sql(
      """SELECT s_nationkey AS nationkey, count(*) AS n_suppliers
        |FROM supplier s
        |WHERE EXISTS (
        |  SELECT 1 FROM customer c
        |  WHERE c.c_nationkey = s.s_nationkey AND c.c_acctbal < 0)
        |GROUP BY s_nationkey""".stripMargin)
  }

  /** q22: unionByName with missing-column fill — the schema-drift-tolerant
    * append path (parity with the reference's schema-free line streams,
    * `container/HboxContainer.java:1153-1173`, now typed). */
  def q22UnionByName(t: Tables): DataFrame = {
    val a = t.customer.select(col("c_custkey").as("key"), col("c_acctbal").as("bal"), col("c_mktsegment").as("segment"))
    val b = t.supplier.select(col("s_suppkey").as("key"), col("s_acctbal").as("bal"))
    val u = a.unionByName(b.withColumn("side", lit("supp")), allowMissingColumns = true)
    u.groupBy(coalesce(col("side"), lit("cust")).as("side"))
      .agg(count(lit(1)).as("n"), dec(sum("bal")).as("bal_sum"))
  }
}
