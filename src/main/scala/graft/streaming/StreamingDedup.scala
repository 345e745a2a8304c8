package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

import graft.operators.{Dedup, ManifestTable, SignatureStore}

/** Streaming arrival of new documents into a continuously-deduplicated
  * corpus: each micro-batch runs one [[SignatureStore.ingestBatch]] tick —
  * near-dups against everything kept so far (earlier micro-batches
  * included) are dropped, the keepers' signatures append as a new store
  * snapshot. The streaming analog of `Dedup.sequentialIngest`, with
  * micro-batches as the arrival waves.
  */
object StreamingDedup {

  /** foreachBatch sink for a stream of `documents`-shaped rows. Use as
    * `docs.writeStream.foreachBatch(foreachBatchIngest(root) _)`.
    *
    * Replay safety (foreachBatch is at-least-once): a replayed batch's
    * docs are already in the store, so content-wise each would self-match
    * at jaccard 1.0 and drop — except shingle-less docs, which never match
    * anything. The id-level guard closes that hole: store ids touched by
    * the batch are pruned map-side (broadcast semi-join on batch ids — the
    * store itself never shuffles, same shape as the band prune inside the
    * tick), and the surviving tiny set anti-joins the batch. An exact
    * replay therefore leaves the store byte-identical and commits nothing.
    */
  def foreachBatchIngest(storeRoot: String, threshold: Double = 0.5,
                         cap: Int = Dedup.MaxBucketSize)
                        (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val fresh = ManifestTable.currentVersion(spark, storeRoot) match {
      case None => batch
      case Some(_) =>
        val storeIds = SignatureStore.read(spark, storeRoot).select("doc_id")
        val touched = storeIds.join(
          broadcast(batch.select("doc_id").distinct()), Seq("doc_id"), "leftsemi")
        batch.join(broadcast(touched), Seq("doc_id"), "left_anti")
    }
    // skip the commit entirely for a fully-replayed batch — no empty
    // snapshots, version advances only when content does
    if (!fresh.isEmpty) SignatureStore.ingestBatch(fresh, storeRoot, threshold, cap)
  }
}
