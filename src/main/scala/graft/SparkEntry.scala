package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Relational

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator declared in SURVEY.md §2.3 appears in `queries`; entries
  * with an ANSI-SQL-expressible semantic also appear in `oracleSql` (DuckDB
  * runs it on the same parquet tables; column names and types are aligned on
  * both sides so the driver's sorted-column hash compare is meaningful).
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String): Tables = Tables(spark, dir)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q03JoinAgg(t(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg"             -> ((s, d) => Relational.q01Agg(t(s, d))),
    "q02_filter_project"  -> ((s, d) => Relational.q02FilterProject(t(s, d))),
    "q03_join_agg"        -> ((s, d) => Relational.q03JoinAgg(t(s, d))),
    "q04_left_join"       -> ((s, d) => Relational.q04LeftJoin(t(s, d))),
    "q05_full_outer"      -> ((s, d) => Relational.q05FullOuter(t(s, d))),
    "q06_semi_join"       -> ((s, d) => Relational.q06SemiJoin(t(s, d))),
    "q07_anti_join"       -> ((s, d) => Relational.q07AntiJoin(t(s, d))),
    "q08_window_rank"     -> ((s, d) => Relational.q08WindowRank(t(s, d))),
    "q09_window_running"  -> ((s, d) => Relational.q09WindowRunning(t(s, d))),
    "q10_topk"            -> ((s, d) => Relational.q10TopK(t(s, d))),
    "q11_setops"          -> ((s, d) => Relational.q11SetOps(t(s, d))),
    "q12_cube"            -> ((s, d) => Relational.q12Cube(t(s, d))),
    "q13_rollup"          -> ((s, d) => Relational.q13Rollup(t(s, d))),
    "q14_distinct"        -> ((s, d) => Relational.q14Distinct(t(s, d))),
    "q15_strings"         -> ((s, d) => Relational.q15Strings(t(s, d))),
    "q16_datetime"        -> ((s, d) => Relational.q16Datetime(t(s, d))),
    "q17_case_null"       -> ((s, d) => Relational.q17CaseNull(t(s, d))),
    "q18_array_explode"   -> ((s, d) => Relational.q18ArrayExplode(t(s, d))),
    "q19_json"            -> ((s, d) => Relational.q19Json(t(s, d))),
    "q20_having_subquery" -> ((s, d) => Relational.q20HavingSubquery(t(s, d))),
    "q21_exists_sql"      -> ((s, d) => Relational.q21ExistsSql(t(s, d))),
    "q22_union_by_name"   -> ((s, d) => Relational.q22UnionByName(t(s, d))),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        | round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge,
        | round(avg(l_quantity),4) AS avg_qty,
        | round(avg(l_extendedprice),4) AS avg_price,
        | round(avg(l_discount),4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        | l_extendedprice*l_discount AS disc_revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q03_join_agg" ->
      """SELECT c_mktsegment,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
        | count(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |GROUP BY c_mktsegment""".stripMargin,
    "q04_left_join" ->
      """SELECT c_nationkey,
        | count(o_orderkey) AS n_orders,
        | CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_customers_no_order,
        | round(coalesce(sum(o_totalprice), 0.0),2) AS total_spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_nationkey""".stripMargin,
    "q05_full_outer" ->
      """SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
        | coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
        |FROM (SELECT c_nationkey AS nationkey, count(*) AS n_cust FROM customer GROUP BY 1) c
        |FULL OUTER JOIN (SELECT s_nationkey AS nationkey, count(*) AS n_supp FROM supplier GROUP BY 1) s
        |USING (nationkey)""".stripMargin,
    "q06_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 150000)
        |GROUP BY c_mktsegment""".stripMargin,
    "q07_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers, round(sum(c_acctbal),2) AS acctbal
        |FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
        |GROUP BY c_mktsegment""".stripMargin,
    "q08_window_rank" ->
      """SELECT o_custkey, CAST(rk AS INT) AS rk, o_orderkey, round(o_totalprice,2) AS totalprice
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        |  FROM orders) WHERE rk <= 3""".stripMargin,
    "q09_window_running" ->
      """SELECT o_custkey, o_orderkey,
        | round(sum(o_totalprice) OVER w, 2) AS running_spend,
        | lag(o_orderkey, 1) OVER w AS prev_orderkey,
        | CAST(row_number() OVER w AS INT) AS order_seq
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,
    "q10_topk" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice,2) AS totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q11_setops" ->
      """WITH big AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000),
        | rich AS (SELECT DISTINCT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000)
        |SELECT 'union' AS op, custkey FROM (SELECT custkey FROM big UNION SELECT custkey FROM rich)
        |UNION ALL
        |SELECT 'intersect' AS op, custkey FROM (SELECT custkey FROM big INTERSECT SELECT custkey FROM rich)
        |UNION ALL
        |SELECT 'except' AS op, custkey FROM (SELECT custkey FROM big EXCEPT SELECT custkey FROM rich)""".stripMargin,
    "q12_cube" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
        | CAST(GROUPING(l_linestatus) AS INT) AS g_status,
        | round(sum(l_quantity),2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
    "q13_rollup" ->
      """SELECT r_name, n_name,
        | CAST(GROUPING(r_name) AS INT) AS g_region,
        | CAST(GROUPING(n_name) AS INT) AS g_nation,
        | count(*) AS n_cust, round(sum(c_acctbal),2) AS acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,
    "q14_distinct" ->
      """SELECT l_returnflag,
        | count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps,
        | count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q15_strings" ->
      """SELECT p_partkey,
        | upper(substring(p_name, 1, 4)) AS prefix4,
        | CAST(length(p_name) AS INT) AS name_len,
        | CAST(len(string_split(p_name, ' ')) AS INT) AS n_words,
        | regexp_extract(p_type, '^(\w+)', 1) AS type_head,
        | concat_ws('|', p_brand, p_type) AS brand_type,
        | CAST(levenshtein(p_brand, 'Brand#11') AS INT) AS lev_to_b11
        |FROM part""".stripMargin,
    "q16_datetime" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS yr,
        | CAST(quarter(o_orderdate) AS INT) AS qtr,
        | count(*) AS n_orders, round(sum(o_totalprice),2) AS total,
        | CAST(max(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')) AS INT) AS max_age_days
        |FROM orders GROUP BY 1, 2""".stripMargin,
    "q17_case_null" ->
      """SELECT CASE WHEN c_acctbal < 0 THEN 'debt'
        |            WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS bal_bucket,
        | (c_nationkey IS NOT DISTINCT FROM 3) AS is_nation3,
        | coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg_or_other,
        | count(*) AS n
        |FROM customer GROUP BY 1, 2, 3""".stripMargin,
    "q18_array_explode" ->
      """SELECT word, count(*) AS freq FROM (
        | SELECT unnest(string_split(lower(p_name), ' ')) AS word FROM part)
        |GROUP BY word""".stripMargin,
    "q19_json" ->
      """SELECT event_type, count(*) AS n,
        | CAST(sum(k) AS BIGINT) AS sum_k, min(k) AS min_k, max(k) AS max_k
        |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events)
        |GROUP BY event_type""".stripMargin,
    "q20_having_subquery" ->
      """SELECT o_orderpriority, round(avg(o_totalprice),4) AS avg_price, count(*) AS n
        |FROM orders GROUP BY o_orderpriority
        |HAVING round(avg(o_totalprice),4) > (SELECT avg(o_totalprice) FROM orders)""".stripMargin,
    "q21_exists_sql" ->
      """SELECT s_nationkey AS nationkey, count(*) AS n_suppliers
        |FROM supplier s
        |WHERE EXISTS (
        |  SELECT 1 FROM customer c
        |  WHERE c.c_nationkey = s.s_nationkey AND c.c_acctbal < 0)
        |GROUP BY s_nationkey""".stripMargin,
    "q22_union_by_name" ->
      """SELECT 'cust' AS side, count(*) AS n, round(sum(c_acctbal),2) AS bal_sum FROM customer
        |UNION ALL
        |SELECT 'supp' AS side, count(*) AS n, round(sum(s_acctbal),2) AS bal_sum FROM supplier""".stripMargin,
  )
}
