package graft.ml

import org.apache.spark.BarrierTaskContext
import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.{HashingTF, IDF, Tokenizer}
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** KMeans over the embedding column — distributed training wholly inside
    * the engine (what the reference shipped out to an external framework). */
  def kmeansClusters(spark: SparkSession, emb: DataFrame, k: Int = 10): DataFrame = {
    import spark.implicits._
    val vecs = emb.select("vec_id", "embedding").as[(Long, Array[Float])]
      .map { case (id, a) => (id, Vectors.dense(a.map(_.toDouble))) }
      .toDF("vec_id", "features")
    val model = new KMeans().setK(k).setSeed(42L).setFeaturesCol("features").fit(vecs)
    model.transform(vecs).select("vec_id", "prediction")
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
