package graft.similarity

import graft.functions.VectorFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** s16: deterministic vector routing — nearest-of-K fixed centroids over
  * the s03-quantized vectors: the data-INDEPENDENT shard router for a
  * distributed vector store. s02's IVF cells are trained (better balance,
  * but rows-only checkable and retrain-coupled); this router is the other
  * point on that trade: centroids are a pure function of a seed, so
  *   - any writer anywhere routes a vector identically with NO model
  *     exchange (the property that matters when 1000 executors ingest
  *     concurrently — nothing to broadcast, version, or retrain);
  *   - the full assignment is exactly reproducible by an independent
  *     engine — rows + schema + hash oracle-checkable, like s13 vs s02.
  * Output: (vec_id, cell, dist2) — the routing table an ingest job would
  * partition by, plus the exact squared distance for monitoring shard
  * spread.
  *
  * Exactness discipline (the s13 rule, lifted from sign-tests to argmin):
  * centroid components are INTEGERS in [−64, 64] from the seeded
  * SplitMix64 stream; distances are computed over s03's int8-quantized
  * vectors (bit-identical across engines), so every dist² =
  * Σq² − 2·Σq·c + Σc² is a sum of integers bounded by 64·(127+64)² ≈
  * 2.3M ≪ 2⁵³ — IEEE-exact in any evaluation order. The argmin tie-break
  * is "first index attaining the min" in both engines (array_position /
  * list_indexof), so no float ever decides a boundary and ties can't
  * diverge.
  *
  * Scale shape: pure scan-local projection — K native codegen dot
  * products per row (VectorFns.dot, whole-stage codegen), zero shuffle,
  * zero state. Routing 100 TB is exactly one pass at scan speed; the
  * downstream `partitionBy(cell)` exchange is the one a sharded write
  * needs anyway.
  */
object Router {

  /** Default cell count — sized for the test corpora. At scale, cells
    * should track the target shard count (e.g. 2–4× executor count);
    * the centroid family is a pure function of (cell, dim), so any
    * prefix of a wider family is the same centroids. */
  val Cells = 8

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Fixed integer centroids: centroidsFor(k)(j)(i) ∈ [−64, 64], a pure
    * function of (j, i) — renders identically into the Spark plan and
    * the DuckDB oracle. (A different stream offset than Srp's planes so
    * the two fixed families are independent.) */
  def centroidsFor(nCells: Int, dims: Int = Srp.Dims): Array[Array[Long]] =
    Array.tabulate(nCells, dims)((j, i) =>
      Math.floorMod(splitmix64(0x5160000L + j.toLong * 4096L + i), 129L) - 64L)

  /** s16: (vec_id, cell, dist2) — nearest fixed centroid per vector. */
  def route(emb: DataFrame, nCells: Int = Cells): DataFrame = {
    val cents = centroidsFor(nCells)
    val q = Quantize.quantized(emb)
      .select(col("vec_id"), col("qvec").cast("array<double>").as("qd"))
    // dist²_j = Σq² − 2·(q·c_j) + Σc_j²: Σq² computed once per row, each
    // q·c_j one native codegen dot, Σc_j² a compile-time constant
    val qq = VectorFns.dot(col("qd"), col("qd"))
    val dists: Column = array(cents.toIndexedSeq.map { c =>
      val cc = c.map(x => x * x).sum
      qq - lit(2.0) * VectorFns.dot(col("qd"), lit(c.map(_.toDouble))) + lit(cc.toDouble)
    }: _*)
    q.select(col("vec_id"), dists.as("ds"))
      .select(col("vec_id"),
        (array_position(col("ds"), array_min(col("ds"))) - 1L).cast("int").as("cell"),
        array_min(col("ds")).cast("long").as("dist2"))
  }

  /** s20: shard-balance audit over [[route]] — per cell its vector count,
    * corpus share, and load factor (n·K/total; 1.0 = perfectly even),
    * INCLUDING empty cells (a left join against the full cell range —
    * an empty shard is exactly what the audit must surface). The check a
    * layout run performs before committing to K: fixed centroids trade
    * balance for coordination-freedom, and this is where that trade is
    * measured (against p14/p21's hash-layout counterparts for rows).
    * Exact: counts, two single divisions. One (cell)-keyed partial-agg
    * exchange over the router's scan-local assignment. */
  def routeBalance(emb: DataFrame, nCells: Int = Cells): DataFrame = {
    val counts = route(emb, nCells).groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vecs"))
    val total = counts.agg(sum(col("n_vecs")).as("total"))
    val cells = emb.sparkSession.range(nCells.toLong)
      .select(col("id").cast("int").as("cell"))
    cells.join(counts, Seq("cell"), "left")
      .select(col("cell"), coalesce(col("n_vecs"), lit(0L)).as("n_vecs"))
      .crossJoin(broadcast(total))
      .select(col("cell"), col("n_vecs"),
        (col("n_vecs").cast("double") / col("total").cast("double")).as("share"),
        (col("n_vecs").cast("double") * lit(nCells.toDouble)
          / col("total").cast("double")).as("load_factor"))
  }

  /** The s20 replay: the s16 pipeline nested, grid via generate_series. */
  def balanceOracleSql(nCells: Int = Cells): String =
    s"""WITH r AS (${oracleSql(nCells)}),
       |counts AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_vecs FROM r GROUP BY cell),
       |grid AS (SELECT CAST(unnest(generate_series(0, ${nCells - 1})) AS INT) AS cell),
       |t AS (SELECT CAST(sum(n_vecs) AS BIGINT) AS total FROM counts)
       |SELECT g.cell, coalesce(c.n_vecs, 0) AS n_vecs,
       | CAST(coalesce(c.n_vecs, 0) AS DOUBLE) / CAST(t.total AS DOUBLE) AS share,
       | CAST(coalesce(c.n_vecs, 0) AS DOUBLE) * ${nCells}.0 / CAST(t.total AS DOUBLE) AS load_factor
       |FROM grid g LEFT JOIN counts c USING (cell) CROSS JOIN t""".stripMargin

  /** The DuckDB replay of [[route]]: same quantization (s03's rendered
    * rule), same centroid literals, same first-min tie-break. */
  def oracleSql(nCells: Int = Cells): String = {
    val cents = centroidsFor(nCells)
    val distExprs = cents.zipWithIndex.map { case (c, j) =>
      val lst = c.map(x => s"$x.0").mkString("[", ", ", "]")
      val cc = c.map(x => x * x).sum
      s"list_dot_product(qd, qd) - 2.0 * list_dot_product(qd, $lst) + $cc.0 AS e$j"
    }.mkString(",\n  ")
    val dsList = (0 until nCells).map(j => s"e$j").mkString("[", ", ", "]")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |s AS (SELECT vec_id, v,
       |  greatest(list_max(list_transform(v, x -> abs(x))), 1e-30) / 127.0 AS scale
       |  FROM e),
       |q AS (SELECT vec_id,
       |  list_transform(v, x -> CAST(CAST(floor(x / scale + 0.5) AS TINYINT) AS DOUBLE)) AS qd
       |  FROM s),
       |d AS (SELECT vec_id,
       |  $distExprs
       |  FROM q),
       |cells AS (SELECT vec_id, $dsList AS ds FROM d)
       |SELECT vec_id,
       | CAST(list_indexof(ds, list_aggregate(ds, 'min')) - 1 AS INT) AS cell,
       | CAST(list_aggregate(ds, 'min') AS BIGINT) AS dist2
       |FROM cells""".stripMargin
  }
}
