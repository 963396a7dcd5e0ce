package graft.operators

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second tranche of the relational surface (SURVEY.md §2.3): window offset
  * functions, math battery, map/JSON schema ops, exact percentiles, array
  * higher-order functions, pivot. Same conventions as Relational. */
object Relational2 {

  /** q27: offset/navigation window functions — ntile, dense_rank, lead,
    * first/last over an explicit frame (deterministic tiebreaks). */
  def q27WindowOffsets(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t.orders.select(
      col("o_custkey"),
      col("o_orderkey"),
      ntile(4).over(w).as("quartile"),
      dense_rank().over(w).as("drank"),
      lead(col("o_orderkey"), 1).over(w).as("next_orderkey"),
      first(col("o_orderkey")).over(full).as("first_orderkey"),
      last(col("o_orderkey")).over(full).as("last_orderkey"))
  }

  /** q28: math scalar battery. Transcendentals (pow/log/exp) are rounded to
    * 6 dp — libm implementations differ in the last ulp across engines;
    * sqrt/abs/ceil/floor are exact IEEE and stay raw. */
  def q28Math(t: Tables): DataFrame =
    t.lineitem
      .filter(col("l_linenumber") === 1)
      .select(
        col("l_orderkey"),
        sqrt(col("l_extendedprice")).as("sqrt_price"),
        abs(col("l_discount") - 0.05).as("abs_disc"),
        ceil(col("l_quantity")).as("ceil_qty"),
        floor(col("l_quantity") / 7).as("floor_qty7"),
        pmod(col("l_orderkey"), lit(97)).as("mod97"),
        round(pow(col("l_quantity"), 1.5), 6).as("pow_qty"),
        round(log(col("l_extendedprice")), 6).as("ln_price"),
        round(exp(col("l_discount")), 6).as("exp_disc"))

  /** q29: JSON → typed map: parse props with an explicit schema, extract
    * keys/values (schema'd from_json, not string hacking). */
  def q29MapJson(t: Tables): DataFrame =
    t.events
      .select(col("event_id"),
        from_json(col("props"),
          org.apache.spark.sql.types.DataType.fromDDL("map<string,int>")).as("m"))
      .select(
        col("event_id"),
        array_join(map_keys(col("m")), ",").as("keys"),
        col("m").getItem("k").as("k_value"),
        size(col("m")).as("n_keys"))

  /** q30: exact percentiles (sort-based; the scale path is
    * approx_percentile/t-digest, exercised in specs). */
  def q30Percentile(t: Tables): DataFrame =
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90"),
        round(expr("percentile(l_extendedprice, 0.99)"), 4).as("p99"))

  /** q31: array higher-order functions over the embedding column —
    * transform/filter/aggregate stay inside codegen. */
  def q31ArrayHof(t: Tables): DataFrame = {
    val v = col("embedding").cast("array<double>")
    t.embeddings.select(
      col("vec_id"),
      round(aggregate(transform(v, x => x * x), lit(0.0), (a, x) => a + x), 4).as("norm_sq"),
      size(filter(v, x => x > 0)).as("n_positive"),
      round(element_at(v, 1), 6).as("first_dim"))
  }

  /** q32: pivot — orders count per priority pivoted over order status
    * (fixed pivot values ⇒ stable schema). */
  def q32Pivot(t: Tables): DataFrame =
    t.orders
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("o_orderpriority"),
        col("F").as("n_f"), col("O").as("n_o"), col("P").as("n_p"))

  /** q34: multiset set ops — intersectAll/exceptAll keep duplicate
    * multiplicity (planned as aggregated counts + replication, one shuffle
    * each). */
  def q34MultisetSetOps(t: Tables): DataFrame = {
    val a = t.orders.filter(col("o_totalprice") > 150000).select(col("o_custkey").as("custkey"))
    val b = t.orders.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey").as("custkey"))
    a.intersectAll(b).select(lit("intersect_all").as("op"), col("custkey"))
      .union(a.exceptAll(b).select(lit("except_all").as("op"), col("custkey")))
  }

  /** q33: scalar subqueries in SELECT (Catalyst plans them as broadcast
    * scalar aggregates — one extra tiny stage, no per-row subplan). */
  def q33ScalarSubquery(t: Tables): DataFrame = {
    t.registerViews()
    t.spark.sql(
      """SELECT n_name,
        |  (SELECT count(*) FROM customer WHERE c_nationkey = n_nationkey) AS n_cust,
        |  (SELECT round(coalesce(sum(s_acctbal), 0.0), 2) FROM supplier
        |   WHERE s_nationkey = n_nationkey) AS supp_bal
        |FROM nation""".stripMargin)
  }
}
