package graft.operators

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized IVF INDEX — model + postings — the piece that makes IVF an
  * actual index at 100 TB.
  *
  * The self-contained [[Similarity.annIvf]] (and its [[CentroidStore]]
  * consumer) computes cell membership map-side per query batch: correct,
  * but every search still SCANS THE WHOLE CORPUS to find the probed cells'
  * members. This store materializes the assignment once per corpus
  * snapshot as a [[ManifestTable]] dataset PARTITIONED BY CELL
  * (`p_cell=N/…`), so a search plans its scan over ONLY the probed cells'
  * files — with nProbe=2 of C cells, ~2/C of the corpus bytes, the
  * classic inverted-file read pattern. Query vectors fetched from the
  * store itself (the oracle-parity self-query form) prune by the
  * manifest's per-file vec_id min/max stats, so even the query fetch
  * opens a bounded file set.
  *
  * The model lives in a nested [[CentroidStore]] (atomic versioned
  * commits, mini-batch refresh); postings inherit ManifestTable snapshot
  * isolation. Search output is byte-identical to
  * [[CentroidStore.annIvf]] / [[Similarity.annIvf]] under the same model
  * (spec-asserted): the probe selection mirrors the column-expression
  * arithmetic exactly (same left-to-right dot fold, same (−cosine, id)
  * tie order) and the scoring runs through the shared
  * [[Similarity.ivfSearchKernel]].
  */
object IvfStore {

  private def modelRoot(root: String) = s"$root/model"
  private def postingsRoot(root: String) = s"$root/postings"

  /** Train (via the nested [[CentroidStore]]) and materialize the postings
    * for a corpus snapshot. Returns the committed postings version.
    */
  def build(emb: DataFrame, root: String, nCentroids: Int = 8,
            iters: Int = Similarity.KmeansIters): Long = {
    val spark = emb.sparkSession
    val mv = CentroidStore.build(emb, modelRoot(root), nCentroids, iters)
    val cents = CentroidStore.readCentroidsAt(spark, modelRoot(root), mv)
    val staging = s"${postingsRoot(root)}/_staging/${UUID.randomUUID()}"
    Similarity.assignedMembers(Similarity.normalized(emb), cents)
      .withColumn("p_cell", col("centroid_id"))
      .write.partitionBy("p_cell").mode(SaveMode.Overwrite).parquet(staging)
    val added = ManifestTable.publishFiles(spark, postingsRoot(root), staging)
    // vec_id stats ride the manifest so the self-query fetch file-prunes
    val entries = ManifestTable.footerMeta(spark,
      ManifestTable.dataDir(postingsRoot(root)), added, Seq("vec_id")).map(_._1)
    val v = ManifestTable.commitEntries(spark, postingsRoot(root), Seq(""), entries)
    ManifestTable.vacuum(spark, postingsRoot(root))
    v
  }

  /** One incremental index tick — the [[SignatureStore.ingestBatch]]
    * pattern for the postings: a NEW batch of embeddings is assigned
    * under the CURRENT staged model (map-side argmax over literal
    * centroids — the existing corpus postings are never re-read or
    * re-shuffled) and APPENDED as new files in their cells' partitions.
    * Optionally refresh the model first ([[CentroidStore.refresh]]'s
    * mini-batch Lloyd tick) — note a refreshed model only affects NEW
    * batches; existing postings keep their assignment (the standard IVF
    * trade: assignments drift from the model until the next full
    * [[build]], bounded by the refresh step size). Returns the committed
    * postings version.
    */
  def ingestBatch(batchEmb: DataFrame, root: String,
                  refreshModel: Boolean = false): Long = {
    val spark = batchEmb.sparkSession
    if (refreshModel) CentroidStore.refresh(batchEmb, modelRoot(root))
    val cents = CentroidStore.readCentroids(spark, modelRoot(root))
    val staging = s"${postingsRoot(root)}/_staging/${UUID.randomUUID()}"
    Similarity.assignedMembers(Similarity.normalized(batchEmb), cents)
      .withColumn("p_cell", col("centroid_id"))
      .write.partitionBy("p_cell").mode(SaveMode.Overwrite).parquet(staging)
    val added = ManifestTable.publishFiles(spark, postingsRoot(root), staging)
    val entries = ManifestTable.footerMeta(spark,
      ManifestTable.dataDir(postingsRoot(root)), added, Seq("vec_id")).map(_._1)
    // no partitions replaced = append: prior snapshots' files carry forward
    val v = ManifestTable.commitEntries(spark, postingsRoot(root), Seq.empty, entries)
    ManifestTable.vacuum(spark, postingsRoot(root))
    v
  }

  /** Driver-side mirror of the probe expression: the same left-to-right
    * IEEE fold as `graft_dot` and the same ascending (−cosine, cid) order
    * as the `array_sort(struct(nc, cid))` probe list — so the staged
    * search probes exactly the cells the self-contained plan probes.
    */
  private def probesOf(cents: Seq[Array[Double]], qv: Array[Double],
                       nProbe: Int): Seq[Int] = {
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0
      var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    cents.zipWithIndex.map { case (cv, c) => (-dot(cv, qv), c) }
      .sortBy(identity).take(nProbe).map(_._2)
  }

  /** Multi-probe search over the staged index, reading ONLY the probed
    * cells' files. `unitQueries` = (query_id, qv) with UNIT query vectors
    * (request-scale, supplied by the caller).
    */
  def annIvf(spark: SparkSession, root: String, unitQueries: DataFrame,
             k: Int = 5, nProbe: Int = 2): DataFrame = {
    import spark.implicits._
    val cents = CentroidStore.readCentroids(spark, modelRoot(root))
    val qvs = unitQueries.select(col("query_id"), col("qv")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val qProbes = qvs.toSeq.flatMap { case (qid, qv) =>
      probesOf(cents, qv, nProbe).map(c => (qid, qv.toSeq, c.toLong))
    }
    val probed = qProbes.map(_._3).toSet
    val pv = ManifestTable.currentVersion(spark, postingsRoot(root))
      .getOrElse(throw new IllegalStateException(s"no postings snapshot at $root"))
    // partition-path pruning: only files under a probed p_cell=… dir plan
    val files = ManifestTable.filesOf(spark, postingsRoot(root), pv)
      .filter(f => probed.exists(c => f.startsWith(s"p_cell=$c/")))
    require(files.nonEmpty, s"no postings files for probed cells $probed")
    val members = spark.read
      .option("basePath", ManifestTable.dataDir(postingsRoot(root)))
      .parquet(files.map(f => s"${ManifestTable.dataDir(postingsRoot(root))}/$f"): _*)
      .select(col("vec_id"), col("v"), col("centroid_id"))
    val q = qProbes.toDF("query_id", "qv", "probe_cid")
    Similarity.ivfSearchKernel(members, q, k)
  }

  /** The oracle-parity self-query form ([[Similarity.annIvf]]'s contract:
    * queries are the corpus vectors with vec_id < nQueries): the query
    * vectors come from the postings themselves through the manifest's
    * vec_id-stats file pruning — no full-corpus scan anywhere in the
    * search.
    */
  def annIvfSelf(spark: SparkSession, root: String, k: Int = 5,
                 nProbe: Int = 2, nQueries: Int = 8): DataFrame = {
    val q = ManifestTable.readWhere(spark, postingsRoot(root), "vec_id",
        0L, nQueries - 1L)
      .filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    annIvf(spark, root, q, k, nProbe)
  }
}
