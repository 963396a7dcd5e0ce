package graft.similarity

import graft.functions.VectorFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *   - `bruteForce`: exact cosine top-k — broadcast the (small) query set
  *     against the corpus, rank per query. The correctness baseline; cost is
  *     |Q|·|corpus| dot products, embarrassingly parallel over corpus
  *     partitions (queries are broadcast, corpus is never shuffled — only
  *     the |Q|·k candidate rows move).
  *   - `ivf`: inverted-file index — corpus is bucketed by nearest centroid
  *     (here: the per-label mean, a stand-in for k-means at this scale);
  *     queries probe only the nProbe nearest centroids. This is the 100 TB
  *     path: the scan touches nProbe/nCells of the corpus.
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

  /** s02: IVF top-k — bucket corpus by nearest of the per-label centroids,
    * probe the nProbe closest cells per query. Approximate (recall < 1 when
    * the true neighbor lives in an unprobed cell) → no SQL oracle; its spec
    * measures recall against bruteForce. */
  def ivf(emb: DataFrame, queryPred: String = "vec_id < 10",
          k: Int = 5, nProbe: Int = 3): DataFrame = {
    val v = emb.select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
    // centroids: per-label mean vector (k-means stand-in; labels are the cells)
    val centroids = v
      .select(col("label"), posexplode(col("v")).as(Seq("i", "x")))
      .groupBy(col("label"), col("i")).agg(avg(col("x")).as("m"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("i"), col("m")))).as("parts"))
      .select(col("label").as("cell"), transform(col("parts"), p => p.getField("m")).as("cv"))
    // assign corpus rows to their nearest centroid cell
    val assigned = v.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("v"), col("cell"),
        VectorFns.l2Sq(col("v"), col("cv")).as("d2"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("d2").asc, col("cell").asc)))
      .filter(col("rnk") === 1).select(col("vec_id"), col("v"), col("cell"))
    // queries probe their nProbe nearest cells
    val q = v.filter(expr(queryPred)).select(col("vec_id").as("query_id"), col("v").as("qv"))
    val probes = q.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("qv"), col("cell"),
        VectorFns.l2Sq(col("qv"), col("cv")).as("d2"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("d2").asc, col("cell").asc)))
      .filter(col("rnk") <= nProbe).select(col("query_id"), col("qv"), col("cell"))
    // scan only the probed cells
    val scored = assigned.join(probes, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(VectorFns.cosine(col("qv"), col("v")), 8).as("cos"))
    topKPerKey(scored, k)
  }
}
