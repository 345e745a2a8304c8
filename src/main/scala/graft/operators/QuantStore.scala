package graft.operators

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Materialized quantized-ANN staging — the cross-query form of
  * [[Similarity.annQuantized]]'s in-plan staging, mirroring
  * [[SignatureStore]].
  *
  * At 100 TB the whole point of scalar quantization is that SEARCH never
  * touches the float corpus: quantize ONCE per corpus snapshot into a
  * [[ManifestTable]] dataset of (vec_id, int8 codes, dequantized norm) —
  * 1/4 the scan bytes of the float embeddings — plus the fitted
  * per-dimension bounds as a one-row sidecar. Every subsequent query reads
  * only the staged codes: fit, quantize and the float scan are all
  * build-time costs, amortized across the query stream, and the staged
  * dataset lives under snapshot isolation (atomic manifest commit, vacuum
  * retention) rather than executor storage memory.
  */
object QuantStore {

  /** Build (or refresh) the staged codes dataset + bounds sidecar for a
    * corpus snapshot. Atomic snapshot replace, like [[SignatureStore.build]].
    * Returns the committed version.
    */
  def build(emb: DataFrame, root: String): Long = {
    val spark = emb.sparkSession
    import spark.implicits._
    val qb = Similarity.fitQuantBounds(emb)
    // one-row bounds sidecar: model metadata, dims-sized, never data-scale
    Seq((qb.mns.toSeq, qb.mxs.toSeq)).toDF("mns", "mxs")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$root/_bounds")
    val staging = s"$root/_staging/${UUID.randomUUID()}"
    Similarity.quantizeCodes(emb, qb)
      .write.mode(SaveMode.Overwrite).parquet(staging)
    val added = ManifestTable.publishFiles(spark, root, staging)
    val version = ManifestTable.commitReplace(spark, root, Seq(""), added)
    ManifestTable.vacuum(spark, root)
    version
  }

  /** The fitted bounds a snapshot was quantized under. */
  def readBounds(spark: SparkSession, root: String): Similarity.QuantBounds = {
    val r = spark.read.parquet(s"$root/_bounds").collect().head
    Similarity.QuantBounds(
      r.getSeq[Double](0).toArray, r.getSeq[Double](1).toArray)
  }

  /** Latest staged codes snapshot. */
  def read(spark: SparkSession, root: String): DataFrame =
    ManifestTable.read(spark, root)

  /** [[Similarity.annQuantized]] off the stage: identical scoring kernel and
    * output, but the only corpus-scale input is the staged int8 codes —
    * `unitQueries` = (query_id, qv) with unit query vectors (queries are
    * request-scale, supplied by the caller, not derived from the corpus).
    */
  def annQuantized(spark: SparkSession, root: String,
                   unitQueries: DataFrame, k: Int = 5): DataFrame =
    Similarity.annQuantizedFrom(read(spark, root), readBounds(spark, root),
      unitQueries, k)
}
