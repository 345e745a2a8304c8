package graft.operators

import java.util.UUID

import org.apache.hadoop.fs.Path
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
  * the k·dim model ships as a tiny parquet sidecar.  Consumers embed the
  * staged centroids as literal expressions — identical plans and
  * byte-identical outputs to the self-contained forms (spec-asserted),
  * minus the training jobs.
  *
  * MODEL ATOMICITY: each build writes to a staging directory and RENAMES it
  * to `v{N}` (an atomic directory move on local/HDFS semantics); readers
  * resolve the highest committed `v{N}`. The earlier layout overwrote the
  * model in place, so a reader racing a rebuild could list a half-written
  * directory; now a version directory is either absent or complete, and a
  * reader pinned to version N is immune to later rebuilds.
  */
object CentroidStore {

  private def fsOf(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versionPath(root: String, v: Long) = new Path(s"$root/v$v")

  /** Committed model versions, ascending. */
  def versions(spark: SparkSession, root: String): Seq[Long] =
    ManifestTable.versionDirs(fsOf(spark, root), new Path(root)).map(_._1)

  /** Train on the corpus snapshot and stage the model. The model is k·dim
    * doubles — pure metadata; the write lands in staging and becomes
    * visible as one atomic rename to the next version directory. Old
    * versions are pruned beyond `retainLast` (readers pin a version, so
    * only already-superseded models are removed). Returns the version.
    */
  def build(emb: DataFrame, root: String, nCentroids: Int = 8,
            iters: Int = Similarity.KmeansIters, retainLast: Int = 2): Long = {
    val e = Similarity.normalized(emb)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try buildFrom(e, root, nCentroids, iters, retainLast)
    finally e.unpersist()
  }

  /** [[build]] over an already-normalized (and caller-persisted) frame —
    * so a caller that also consumes the corpus (the [[IvfStore]] postings
    * write) normalizes and scans ONCE, not once per phase.
    */
  private[operators] def buildFrom(e: DataFrame, root: String,
                                   nCentroids: Int, iters: Int,
                                   retainLast: Int = 2): Long = {
    val spark = e.sparkSession
    val cents = Similarity.trainCentroidsFrom(e, nCentroids, iters)
    // per-centroid member counts under the FINAL model: the mass each
    // centroid represents, which [[refresh]]'s mini-batch update weighs
    // new batches against (k rows of metadata, one extra assignment pass)
    val weights = Similarity.lloydSums(e, cents).map { case (c, (_, n)) => c -> n }
    commitModel(spark, root, cents.zipWithIndex.map { case (cv, c) =>
      (c.toLong, cv, weights.getOrElse(c, 0L))
    }, retainLast)
  }

  /** One INCREMENTAL model tick — the [[SignatureStore.ingestBatch]]
    * pattern for the k-means model: a mini-batch Lloyd round (Sculley
    * 2010, spherical form) updates the staged centroids from a NEW batch
    * alone, weighted by the mass each centroid already represents:
    *
    *   c' = normalize(weight_c · c + Σ_batch-members v),   weight' = weight_c + n_c
    *
    * The corpus is never re-read — at 100 TB a full retrain per ingest
    * tick is the non-viable path this replaces; the batch pass is one
    * map-side assignment + a k·dim metadata aggregate (the same
    * fixed-point kernel as training, so the update is order-free and
    * reproducible). Centroids with no batch members keep their direction
    * and weight. Commits the next model version atomically; returns it.
    */
  def refresh(batchEmb: DataFrame, root: String, retainLast: Int = 2,
              tick: Option[String] = None): Long =
    refreshFrom(Similarity.normalized(batchEmb), root, retainLast, tick)

  /** [[refresh]] over an already-normalized (and caller-persisted) batch —
    * the [[buildFrom]] seam: a caller that also consumes the batch (the
    * [[IvfStore]] postings tick) normalizes and scans ONCE, not once per
    * phase.
    */
  private[operators] def refreshFrom(e: DataFrame, root: String,
                                     retainLast: Int = 2,
                                     tick: Option[String] = None): Long = {
    val spark = e.sparkSession
    val v = currentVersion(spark, root)
    val model = readModelAt(spark, root, v)
    val cents = model.map(_._2)
    val sums = Similarity.lloydSums(e, cents)
    val updated = model.zipWithIndex.map { case ((cid, cv, w), c) =>
      sums.get(c) match {
        case None => (cid, cv, w)
        case Some((sx, n)) =>
          val mixed = cv.indices.map(i => w.toDouble * cv(i) + sx(i)).toArray
          var acc = 0.0
          mixed.foreach(x => acc += x * x)
          val nrm = math.sqrt(acc)
          // a batch can cancel the weighted mix exactly (e.g. one vector
          // antipodal to a weight-1 centroid): norm 0 would commit NaN
          // directions and poison every later consumer — keep the previous
          // direction, still absorb the batch mass
          if (nrm > 0.0 && java.lang.Double.isFinite(nrm))
            (cid, mixed.map(_ / nrm), w + n)
          else (cid, cv, w + n)
      }
    }
    commitModel(spark, root, updated, retainLast, tick)
  }

  private def commitModel(spark: SparkSession, root: String,
                          model: Seq[(Long, Array[Double], Long)],
                          retainLast: Int,
                          tick: Option[String] = None): Long = {
    import spark.implicits._
    val fs = fsOf(spark, root)
    val staging = new Path(s"$root/_staging_${UUID.randomUUID()}")
    model.map { case (cid, cv, w) => (cid, cv.toSeq, w) }
      .toDF("centroid_id", "cv", "weight")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(staging.toString)
    // the tick marker rides INSIDE the staging dir so it commits with the
    // same atomic rename (underscore prefix → invisible to the parquet
    // reader); [[tickOf]] lets an at-least-once caller detect a refresh
    // that already landed before a crash and skip the re-apply
    tick.foreach { id =>
      require(id.matches("[A-Za-z0-9._-]+"), s"unsafe tick id: $id")
      fs.create(new Path(staging, s"_tick_$id")).close()
    }
    val v = versions(spark, root).lastOption.getOrElse(0L) + 1L
    require(fs.rename(staging, versionPath(root, v)),
      s"model commit failed: v$v already exists (concurrent build?)")
    val expired = versions(spark, root).dropRight(retainLast.max(1))
    expired.foreach(old => fs.delete(versionPath(root, old), true))
    // reap staging orphans of failed/crashed earlier builds (single-writer
    // contract: any other _staging_* dir at commit time is garbage, not an
    // in-flight peer)
    fs.listStatus(new Path(root)).foreach { st =>
      if (st.getPath.getName.startsWith("_staging_"))
        fs.delete(st.getPath, true)
    }
    v
  }

  /** The staged model rows (centroid_id, centroids, weight) of `version`. */
  private def readModelAt(spark: SparkSession, root: String,
                          version: Long): Seq[(Long, Array[Double], Long)] =
    spark.read.parquet(versionPath(root, version).toString).collect()
      .sortBy(_.getAs[Long]("centroid_id"))
      .map(r => (r.getAs[Long]("centroid_id"), r.getSeq[Double](1).toArray,
        r.getAs[Long]("weight"))).toSeq

  /** Per-centroid represented mass of `version` (build counts + refreshed
    * batch members).
    */
  def readWeightsAt(spark: SparkSession, root: String,
                    version: Long): Seq[Long] =
    readModelAt(spark, root, version).map(_._3)

  /** The staged model of `version`, in centroid-id order. */
  def readCentroidsAt(spark: SparkSession, root: String,
                      version: Long): Seq[Array[Double]] =
    readModelAt(spark, root, version).map(_._2)

  /** The current staged model, in centroid-id order. */
  def readCentroids(spark: SparkSession, root: String): Seq[Array[Double]] =
    readCentroidsAt(spark, root, currentVersion(spark, root))

  private[operators] def currentVersion(spark: SparkSession, root: String): Long =
    versions(spark, root).lastOption
      .getOrElse(throw new IllegalStateException(s"no staged model at $root"))

  /** The tick id model `version` was committed under, if any — the replay
    * marker [[refresh]] callers use for crash-idempotent ingest ticks.
    */
  private[operators] def tickOf(spark: SparkSession, root: String,
                                version: Long): Option[String] =
    fsOf(spark, root).listStatus(versionPath(root, version))
      .map(_.getPath.getName).collectFirst {
        case n if n.startsWith("_tick_") => n.stripPrefix("_tick_")
      }

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
