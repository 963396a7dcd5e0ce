package graft.ml

import org.apache.spark.BarrierTaskContext
import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, HashingTF, IDF, MinHashLSH, NGram, Tokenizer}
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ML / distributed-training parity (SURVEY.md §2.2 C1–C5, §7 M4).
  *
  * The reference's whole purpose is scheduling opaque training jobs with a
  * rendezvous step — TF ClusterSpec gather/broadcast
  * (`AM/ApplicationContainerListener.java:768-803`), LightGBM ip-port lists
  * (`container/HboxContainer.java:804-880`), PyTorch rank-0 exchange
  * (`:882-909`). Spark-native replacements:
  *   - in-engine training: `spark.ml` Pipelines (no external process at all);
  *   - gang-scheduled rendezvous for external frameworks: barrier execution —
  *     `BarrierTaskContext.getTaskInfos()` hands every task the full address
  *     list, which IS the ClusterSpec.
  */
object MlOps {

  /** Text featurization pipeline (tokenize → hashingTF → IDF): the in-engine
    * analog of the reference's text-preprocessing worker scripts. */
  def tfidfPipeline(docs: DataFrame, numFeatures: Int = 1 << 12): DataFrame = {
    val pipe = new Pipeline().setStages(Array(
      new Tokenizer().setInputCol("text").setOutputCol("words"),
      new HashingTF().setInputCol("words").setOutputCol("tf").setNumFeatures(numFeatures),
      new IDF().setInputCol("tf").setOutputCol("tfidf")))
    pipe.fit(docs).transform(docs)
  }

  /** (vec_id, features) MLlib vector view of an embedding table. */
  private def toFeatures(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    emb.select("vec_id", "embedding").as[(Long, Array[Float])]
      .map { case (id, a) => (id, Vectors.dense(a.map(_.toDouble))) }
      .toDF("vec_id", "features")
  }

  /** KMeans over the embedding column — distributed training wholly inside
    * the engine (what the reference shipped out to an external framework). */
  def kmeansClusters(spark: SparkSession, emb: DataFrame, k: Int = 10): DataFrame = {
    val vecs = toFeatures(emb)
    val model = new KMeans().setK(k).setSeed(42L).setFeaturesCol("features").fit(vecs)
    model.transform(vecs).select("vec_id", "prediction")
  }

  /** KMeans cluster centers — the tiny model artifact (k × dims doubles)
    * that parameterizes Knn.ivf's cells. Training is distributed; only the
    * centers come back to the driver. Random init + few Lloyd iterations:
    * IVF cells only need a reasonable space partition, not converged
    * clusters, and k-means|| init alone costs more passes over the corpus
    * than the handful of iterations that matter. Input is cached for the
    * iteration passes and released before returning. */
  def kmeansCenters(emb: DataFrame, k: Int = 10, maxIter: Int = 5): Array[Array[Double]] = {
    val vecs = toFeatures(emb).persist()
    try {
      val model = new KMeans().setK(k).setSeed(42L).setMaxIter(maxIter)
        .setInitMode("random").setFeaturesCol("features").fit(vecs)
      model.clusterCenters.map(_.toArray)
    } finally { vecs.unpersist(blocking = false); () }
  }

  /** MLlib-native near-dup candidates: tokenize → 3-grams → binary HashingTF
    * → MinHashLSH approx self-join. The library counterpart of the hand-tuned
    * banded implementation in graft.dedup.Dedup.minHashLshPairs (which stays
    * the bench path); OR-amplified with 8 hash tables, so a pair at jaccard
    * ≥ 0.8 is missed with probability (1-0.8)^8 ≈ 3e-6.
    * `maxDistance` is Jaccard *distance* (1 - similarity). */
  def mlMinHashNearDups(docs: DataFrame, maxDistance: Double = 0.2): DataFrame = {
    val featurize = new Pipeline().setStages(Array(
      new Tokenizer().setInputCol("text").setOutputCol("words"),
      new NGram().setN(3).setInputCol("words").setOutputCol("grams"),
      new HashingTF().setInputCol("grams").setOutputCol("features")
        .setNumFeatures(1 << 18).setBinary(true)))
    val feats = featurize.fit(docs).transform(docs)
      .filter(size(col("grams")) > 0) // MinHashLSH rejects all-zero vectors
      .select("doc_id", "features")
    val model = new MinHashLSH().setNumHashTables(8).setSeed(42L)
      .setInputCol("features").setOutputCol("hashes").fit(feats)
    model.approxSimilarityJoin(feats, feats, maxDistance, "dist")
      .filter(col("datasetA.doc_id") < col("datasetB.doc_id"))
      .select(
        col("datasetA.doc_id").as("d1"),
        col("datasetB.doc_id").as("d2"),
        round(lit(1.0) - col("dist"), 4).as("jaccard"))
  }

  /** MLlib-native ANN over embeddings: random-hyperplane bucketing
    * (BucketedRandomProjectionLSH) + approx self-join within a euclidean
    * radius. Library counterpart of graft.similarity.Knn.ivf. */
  def mlEuclideanNearDups(spark: SparkSession, emb: DataFrame,
                          radius: Double = 4.0): DataFrame = {
    import spark.implicits._
    val vecs = emb.select("vec_id", "embedding").as[(Long, Array[Float])]
      .map { case (id, a) => (id, Vectors.dense(a.map(_.toDouble))) }
      .toDF("vec_id", "features")
    val model = new BucketedRandomProjectionLSH()
      .setBucketLength(2.0).setNumHashTables(4).setSeed(42L)
      .setInputCol("features").setOutputCol("hashes").fit(vecs)
    model.approxSimilarityJoin(vecs, vecs, radius, "dist")
      .filter(col("datasetA.vec_id") < col("datasetB.vec_id"))
      .select(
        col("datasetA.vec_id").as("d1"),
        col("datasetB.vec_id").as("d2"),
        round(col("dist"), 6).as("dist"))
  }

  /** Barrier-mode rendezvous: every task learns the full task-address list
    * before proceeding — the Spark-native TF_CONFIG/ClusterSpec (replaces
    * reference RPCs reportReservedPort/getClusterDef,
    * `ApplicationContainerProtocol.java:43-55`). Returns (rank, address,
    * clusterSize) per task. */
  def rendezvous(spark: SparkSession, numTasks: Int): Array[(Int, String, Int)] =
    spark.sparkContext
      .parallelize(0 until numTasks, numTasks)
      .barrier()
      .mapPartitions { _ =>
        val ctx = BarrierTaskContext.get()
        val infos = ctx.getTaskInfos()
        ctx.barrier()
        Iterator((ctx.partitionId(), infos(ctx.partitionId()).address, infos.length))
      }
      .collect()
}
