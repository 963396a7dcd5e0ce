package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Third tranche of the relational surface (SURVEY.md §2.3): explicit
  * GROUPING SETS, date-truncation battery, and JSON *generation* (to_json —
  * the inverse of q19/q29's parsing). Same conventions as Relational. */
object Relational3 {

  /** q36: explicit GROUPING SETS — the general form cube/rollup specialize
    * (one shuffled aggregate; Catalyst expands the sets map-side, so this
    * stays a single exchange like q12/q13). */
  def q36GroupingSets(t: Tables): DataFrame =
    t.customer
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .groupingSets(
        Seq(Seq(col("c_mktsegment"), col("n_name")), Seq(col("c_mktsegment")), Seq()),
        col("c_mktsegment"), col("n_name"))
      .agg(
        grouping(col("c_mktsegment")).cast("int").as("g_seg"),
        grouping(col("n_name")).cast("int").as("g_nation"),
        count(lit(1)).as("n_cust"),
        round(sum(col("c_acctbal")), 2).as("acctbal"))

  /** q37: date truncation/derivation — date_trunc to month, to_date, and
    * last_day; grouped so the truncation is also exercised as a shuffle key.
    * Truncated values are emitted as strings for cross-engine comparability
    * (Spark's date_trunc yields TIMESTAMP, DuckDB's yields DATE). */
  def q37DateTrunc(t: Tables): DataFrame =
    t.orders
      .select(
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
        date_format(last_day(to_date(col("o_orderdate"))), "yyyy-MM-dd").as("month_end"),
        col("o_totalprice"))
      .groupBy(col("month_start"), col("month_end"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total"))

  /** q39: RANGE window frame — value-based frame bounds (all orders of the
    * same customer within 10000 of the current price, peers included), the
    * frame kind q09/q27's ROWS frames don't exercise. Deterministic under
    * ties because RANGE includes all peers of the current row. */
  def q39RangeFrame(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice"))
      .rangeBetween(-10000L, Window.currentRow)
    t.orders.select(
      col("o_custkey"),
      col("o_orderkey"),
      round(col("o_totalprice"), 2).as("totalprice"),
      round(sum(col("o_totalprice")).over(w), 2).as("nearby_spend"),
      count(lit(1)).over(w).as("n_nearby"))
  }

  /** q40: LATERAL correlated subquery — per-nation top-2 customers by
    * balance. The lateral form decorrelates to a ranked window under the
    * hood; expressed in SQL because LATERAL is a SQL-surface feature. */
  def q40Lateral(t: Tables): DataFrame = {
    val spark = t.spark
    t.nation.createOrReplaceTempView("nation")
    t.customer.createOrReplaceTempView("customer")
    spark.sql(
      """SELECT n_name, c_custkey, acctbal FROM nation,
        |LATERAL (SELECT c_custkey, round(c_acctbal, 2) AS acctbal FROM customer
        |         WHERE c_nationkey = n_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 2) top2""".stripMargin)
  }

  /** q41: unpivot/melt — wide per-priority metrics to long (metric, value)
    * rows, the inverse reshape of q32's pivot. */
  def q41Unpivot(t: Tables): DataFrame =
    t.orders
      .groupBy(col("o_orderpriority"))
      .agg(
        round(sum("o_totalprice"), 2).as("total_price"),
        round(avg("o_totalprice"), 4).as("avg_price"),
        count(lit(1)).cast("double").as("n_orders"))
      .unpivot(
        Array(col("o_orderpriority")),
        Array(col("total_price"), col("avg_price"), col("n_orders")),
        "metric", "value")

  /** q42: explicit cross join — every (region, orderpriority) cell with the
    * region's customer count. Both sides are tiny aggregates, so the product
    * is a BroadcastNestedLoopJoin of O(|regions|·|priorities|) rows — the
    * only safe cross-join shape at scale (never fact × fact). */
  def q42CrossJoin(t: Tables): DataFrame = {
    val regions = t.customer
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name")).agg(count(lit(1)).as("n_cust"))
    val prios = t.orders.select(col("o_orderpriority")).distinct()
    regions.crossJoin(prios)
      .select(col("r_name"), col("o_orderpriority"), col("n_cust"))
  }

  /** q44: recursive CTE — Spark 4's `WITH RECURSIVE` (UnionLoop): a
    * recursively generated month scaffold LEFT-joined to 1995 order
    * counts, so months with no orders surface as zero rows — the gapless
    * series/scaffold pattern warehouses use for calendar reports, which a
    * plain GROUP BY cannot produce (absent groups simply don't exist).
    * DuckDB runs the identical WITH RECURSIVE text as the oracle.
    *
    * Scale shape: the recursion iterates 12 times over a ONE-ROW frame
    * (driver-cheap UnionLoopExec); the corpus side is scanned once and
    * joined after the scaffold materializes — never a corpus-sized loop. */
  def q44RecursiveCte(t: Tables): DataFrame = {
    t.registerViews()
    t.spark.sql(
      """WITH RECURSIVE months(m) AS (
        |  SELECT 1
        |  UNION ALL
        |  SELECT m + 1 FROM months WHERE m < 12)
        |SELECT m AS month, count(o_orderkey) AS n_orders
        |FROM months LEFT JOIN orders
        |  ON month(o_orderdate) = m AND year(o_orderdate) = 1995
        |GROUP BY m""".stripMargin)
  }

  /** q45: VARIANT ingestion — Spark 4's semi-structured type: `parse_json`
    * produces a binary VARIANT (shredded, columnar-friendly encoding — the
    * modern replacement for per-row `get_json_object` string parsing used
    * in q19/q29), and `variant_get` extracts typed values path-wise. The
    * aggregation shape proves the extracted values behave as first-class
    * typed columns. At 100 TB the difference is material: VARIANT decodes
    * once at the scan and serves every downstream extraction, where
    * string-path JSON re-parses per expression. */
  def q45Variant(t: Tables): DataFrame =
    t.events
      .select(col("event_type"),
        variant_get(parse_json(col("props")), "$.k", "int").as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        countDistinct(col("k")).as("distinct_k"))

  /** q46: aggregate FILTER clause + GROUP BY ALL — per-group conditional
    * aggregates without the CASE-WHEN contortion q32's manual pivot uses:
    * each aggregate carries its own predicate, evaluated map-side inside
    * the same single-exchange hash aggregate (the filter prunes rows into
    * the partial agg, so the shuffle still carries one row per group per
    * aggregate — nothing widens). GROUP BY ALL infers the grouping keys
    * from the non-aggregate select items (Spark 3.4+/DuckDB share the
    * syntax), so the identical SQL text runs in both engines. The
    * no-qualifying-rows case (an avg FILTER that matches nothing) must
    * surface as NULL in both — exercised by the high-price predicate. */
  def q46FilterAgg(t: Tables): DataFrame = {
    t.registerViews()
    t.spark.sql(q46Sql)
  }

  /** Identical text runs as the DuckDB oracle (the q44 convention). */
  val q46Sql: String =
    """SELECT o_orderpriority, o_orderstatus,
      | count(*) AS n_orders,
      | count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
      | round(coalesce(sum(o_totalprice) FILTER (WHERE o_totalprice > 200000), 0.0), 2) AS big_value,
      | round(avg(o_totalprice) FILTER (WHERE o_totalprice > 400000), 4) AS avg_huge
      |FROM orders
      |GROUP BY ALL""".stripMargin

  /** q47: ordered string aggregation — Spark 4's `listagg(expr, delim)
    * WITHIN GROUP (ORDER BY …)`, the denormalizing reshape reporting
    * pipelines use (one row per group, members as a delimited string).
    * The explicit total ORDER BY is what makes the concatenation
    * deterministic and therefore oracle-checkable (an unordered listagg
    * is partition-order-dependent — never hashable). Scale note: the
    * output string is group-sized by construction, so this operator
    * belongs on BOUNDED groups (dimension rollups like this region →
    * nations one) — on fact-sized groups the correct tool is q10's top-k
    * or p05's packing, not a gigastring. DuckDB's `string_agg(x, d ORDER
    * BY …)` is the oracle spelling of the same aggregate. */
  def q47Listagg(t: Tables): DataFrame = {
    t.registerViews()
    t.spark.sql(
      """SELECT r_name,
        | listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations,
        | count(*) AS n_nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin)
  }

  /** q48: distribution window functions — percent_rank, cume_dist and
    * nth_value, the remaining members of the window battery (q08/q09/q27/
    * q39 cover ranking/running/offset/RANGE). Both fractions are integer-
    * derived single divisions ((rank−1)/(n−1), ranked_rows/n) over a TOTAL
    * order (orderkey tiebreak), so they are bit-exact across engines
    * unrounded; nth_value runs over the full ROWS frame, the q27
    * first/last convention. Same one-exchange window shape as q08. */
  def q48WindowDist(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    val wf = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t.orders.select(
      col("o_custkey"),
      col("o_orderkey"),
      percent_rank().over(w).as("pct_rank"),
      cume_dist().over(w).as("cdist"),
      nth_value(col("o_orderkey"), 2).over(wf).as("second_order"))
  }

  /** q49: error-safe expression battery — the `try_*` family that makes
    * ANSI mode (Spark 4's default) livable on dirty data: try_cast on
    * non-numeric text, try_divide by zero, try_element_at past the end —
    * each yields NULL where the strict form would fail the query. On a
    * 100 TB corpus a single malformed cell otherwise kills a stage at the
    * end of an hours-long job; the try-forms turn data errors into
    * auditable NULL counts. DuckDB oracles the same semantics with
    * TRY_CAST / a guarded CASE division / native out-of-range NULL
    * list indexing. */
  def q49TrySafe(t: Tables): DataFrame = {
    t.registerViews()
    t.spark.sql(
      """SELECT p_partkey,
        | try_cast(regexp_extract(p_brand, '([0-9]+)', 1) AS INT) AS brand_num,
        | try_cast(p_name AS INT) AS name_num,
        | try_divide(p_retailprice, p_size - p_size) AS div0,
        | try_element_at(split(p_name, ' '), 2) AS word2,
        | try_element_at(split(p_name, ' '), 100) AS word100
        |FROM part""".stripMargin)
  }

  /** q50: map-manipulation battery — map construction from columns, then
    * `map_filter`, `transform_values` and `map_concat` (the map HOF family
    * q29/q31's array HOFs don't touch). Maps have no portable cross-engine
    * representation, so each result serializes to a canonical
    * key-sorted `k:v` string — the oracle then reduces to plain string
    * concatenation over the known keys, which is trivially correct and
    * pins the map semantics (dropped key, rewritten values, appended
    * entry) value-for-value. Scan-local projection, zero shuffle. */
  def q50MapOps(t: Tables): DataFrame = {
    def ser(m: Column): Column = array_join(
      transform(array_sort(map_keys(m)), k => concat(k, lit(":"), element_at(m, k))), ",")
    val m = map(
      lit("k"), get_json_object(col("props"), "$.k"),
      lit("type"), col("event_type"),
      lit("user"), col("user_id").cast("string"))
    t.events.select(
      col("event_id"),
      ser(map_filter(m, (k, _) => k =!= "user")).as("kept"),
      ser(transform_values(m, (k, v) => concat(k, lit("="), v))).as("tagged"),
      ser(map_concat(m, map(lit("extra"), lit("1")))).as("extended"),
      size(m).cast("int").as("n_entries"))
  }

  /** q38: JSON generation — re-serialize parsed event props plus a typed
    * column into a compact JSON string (round-trips q19's extraction). */
  def q38ToJson(t: Tables): DataFrame =
    t.events
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"),
        col("event_type"))
      .select(
        col("event_id"),
        to_json(struct(col("event_type").as("et"), col("k"))).as("js"))
}
