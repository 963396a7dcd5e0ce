package graft.similarity

import graft.functions.VectorFns
import graft.ml.MlOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *   - `bruteForce`: exact cosine top-k — broadcast the (small) query set
  *     against the corpus, rank per query. The correctness baseline; cost is
  *     |Q|·|corpus| dot products, embarrassingly parallel over corpus
  *     partitions (queries are broadcast, corpus is never shuffled — only
  *     the |Q|·k candidate rows move).
  *   - `ivf`: inverted-file index — corpus is bucketed by nearest KMeans
  *     centroid; queries probe only the nProbe nearest centroids. This is
  *     the 100 TB path: the scan touches nProbe/nCells of the corpus, and
  *     cell assignment is pure map-side (no shuffle between the scan and
  *     the cell filter).
  *
  * Ranking uses round(cos, 8) with vec_id tiebreak so ordering is stable
  * across engines and runs.
  */
object Knn {

  /** s01: exact cosine top-k for each query vector.
    * Scoring streams over corpus partitions against the broadcast query set;
    * the per-query top-k is a bounded-heap Aggregator (TopKAgg), so partial
    * aggregation clips every partition to k candidates *before* the shuffle —
    * the exchange is O(|Q|·k·partitions), independent of corpus size. */
  def bruteForce(emb: DataFrame, queryPred: String = "vec_id < 10", k: Int = 5): DataFrame = {
    val v = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = v.filter(expr(queryPred)).select(col("vec_id").as("query_id"), col("v").as("qv"))
    val scored = v.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(VectorFns.cosine(col("qv"), col("v")), 8).as("cos"))
    topKPerKey(scored, k)
  }

  /** Shared (query_id, neighbor_id, cos) → ranked top-k reshaper. Public:
    * it is the engine's bounded per-key top-k (partial aggregation clips
    * each partition to k before the shuffle), useful beyond knn. */
  def topKPerKey(scored: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new TopKAgg(k))
    scored
      .groupBy(col("query_id"))
      .agg(topk(col("cos"), col("neighbor_id")).as("topk"))
      .select(col("query_id"), posexplode(col("topk")))
      .select(
        col("query_id"),
        (col("pos") + 1).cast("int").as("rank"),
        col("col._2").as("neighbor_id"),
        col("col._1").as("cos"))
  }

  /** s02: IVF top-k — bucket corpus by nearest KMeans centroid, probe the
    * nProbe closest cells per query. Approximate (recall < 1 when the true
    * neighbor lives in an unprobed cell) → no SQL oracle; its spec measures
    * recall against bruteForce.
    *
    * Scale shape: centroids come from distributed KMeans (MlOps) but the
    * fitted model is tiny (nCells × dims doubles), so it rides into every
    * task as a *literal array column* — cell assignment is an argmin
    * expression evaluated map-side during the scan, with NO shuffle between
    * the scan and the cell filter. (The previous formulation crossJoined
    * corpus × centroids and ran a row_number window partitioned by vec_id —
    * shuffling corpus×nCells rows to compute an argmin that needs none.)
    * The only exchanges left are the broadcast of the probe set and the
    * final top-k aggregation. */
  def ivf(emb: DataFrame, queryPred: String = "vec_id < 10",
          k: Int = 5, nProbe: Int = 3, nCells: Int = 10): DataFrame = {
    val v = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cents: Column = array(MlOps.kmeansCenters(emb, nCells).zipWithIndex.map {
      case (c, i) => struct(lit(i).as("cell"), array(c.map(lit(_)): _*).as("cv"))
    }: _*)
    // distances to every centroid as (d2, cell) structs: struct comparison
    // is lexicographic, so array_min IS the argmin (ties → lower cell) and
    // array_sort + slice yields the nProbe nearest cells
    def dists(vec: Column): Column =
      transform(cents, c => struct(
        VectorFns.l2Sq(vec, c.getField("cv")).as("d2"),
        c.getField("cell").as("cell")))
    val assigned = v.select(col("vec_id"), col("v"),
      array_min(dists(col("v"))).getField("cell").as("cell"))
    val q = v.filter(expr(queryPred)).select(col("vec_id").as("query_id"), col("v").as("qv"))
    val probes = q.select(col("query_id"), col("qv"),
        explode(slice(array_sort(dists(col("qv"))), 1, nProbe)).as("p"))
      .select(col("query_id"), col("qv"), col("p.cell").as("cell"))
    // scan only the probed cells: probes are broadcast, the corpus side
    // streams through the join unshuffled
    val scored = assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(VectorFns.cosine(col("qv"), col("v")), 8).as("cos"))
    topKPerKey(scored, k)
  }
}
