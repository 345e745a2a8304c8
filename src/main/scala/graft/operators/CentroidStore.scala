package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Materialized k-means model staging — "train once, serve everywhere" for
  * every centroid consumer ([[Similarity.ivfAssign]] assignment,
  * [[Similarity.annIvf]] multi-probe search, [[Similarity.semDedup]]),
  * mirroring [[SignatureStore]]/[[QuantStore]].
  *
  * The self-contained query forms each run the full Lloyd training in-query
  * (deliberately, so every query is reproducible from raw inputs alone); in
  * production the training pass over the corpus is the dominant cost and is
  * identical across consumers, so it runs ONCE per corpus snapshot here and
  * the k·dim model ships as a tiny parquet sidecar. Consumers embed the
  * staged centroids as literal expressions — identical plans and
  * byte-identical outputs to the self-contained forms (spec-asserted),
  * minus the training jobs.
  */
object CentroidStore {

  /** Train on the corpus snapshot and stage the model. The model is k·dim
    * doubles — pure metadata; the write is a single tiny file, atomically
    * replaced per snapshot.
    */
  def build(emb: DataFrame, root: String, nCentroids: Int = 8,
            iters: Int = Similarity.KmeansIters): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cents = Similarity.trainCentroids(emb, nCentroids, iters)
    cents.zipWithIndex.map { case (cv, c) => (c.toLong, cv.toSeq) }
      .toDF("centroid_id", "cv")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(root)
  }

  /** The staged model, in centroid-id order. */
  def readCentroids(spark: SparkSession, root: String): Seq[Array[Double]] =
    spark.read.parquet(root).collect()
      .sortBy(_.getAs[Long]("centroid_id"))
      .map(_.getSeq[Double](1).toArray).toSeq

  /** [[Similarity.ivfAssign]] off the stage: no training jobs in the plan. */
  def ivfAssign(emb: DataFrame, root: String): DataFrame =
    Similarity.ivfAssignFrom(Similarity.normalized(emb),
      readCentroids(emb.sparkSession, root))

  /** [[Similarity.annIvf]] off the stage. */
  def annIvf(emb: DataFrame, root: String, k: Int = 5, nProbe: Int = 2,
             nQueries: Int = 8): DataFrame =
    Similarity.annIvfFrom(Similarity.normalized(emb),
      readCentroids(emb.sparkSession, root), k, nProbe, nQueries)

  /** [[Similarity.semDedup]] off the stage. */
  def semDedup(emb: DataFrame, root: String,
               threshold: Double = 0.35): DataFrame =
    Similarity.semDedupFrom(Similarity.normalized(emb),
      readCentroids(emb.sparkSession, root), threshold)
}
