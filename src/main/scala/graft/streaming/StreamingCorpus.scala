package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.{CorpusStore, Dedup}

/** Streaming arrival of raw documents into the continuously-built training
  * corpus: each micro-batch is one [[CorpusStore.tick]] — quality gate,
  * exact + near-dup dedup against everything kept so far, one atomic
  * keeper-append. The streaming form of the production corpus loop
  * (micro-batches = the arrival waves of `corpusPipelineIncremental`);
  * [[CorpusStore.manifest]] rebuilds the packed training manifest from the
  * accumulated store whenever a loader refresh needs it.
  */
object StreamingCorpus {

  /** foreachBatch sink for a stream of `documents`-shaped rows. Use as
    * `docs.writeStream.foreachBatch(foreachBatchIngest(root, "lineage1") _)`.
    *
    * Replay safety (foreachBatch is at-least-once): `tickPrefix` + the
    * Spark batch id is the tick id, so a re-delivered batch skips via the
    * store's `_ticks/` marker before any work; a marker lost to a crash
    * between commit and marker write degrades to the semantic replay —
    * every document drops at the exact-md5/near-dup checks and zero
    * keepers commit nothing (both paths spec-asserted byte-stable on
    * [[CorpusStore]]). A batch whose documents ALL drop (junk below the
    * quality gate, or pure duplicates) is a recorded no-op, never a
    * stream failure.
    *
    * CHECKPOINT-LINEAGE CONTRACT — why `tickPrefix` is REQUIRED: batch
    * ids are only unique within ONE streaming checkpoint. A query
    * restarted against the same store root with a NEW (or deleted)
    * checkpoint restarts batch numbering at 0, and a shared prefix would
    * collide with the old lineage's markers — silently replay-skipping
    * genuinely new batches (corpus data loss). Give each checkpoint
    * lineage its own prefix (e.g. derived from the query's runId or the
    * checkpoint path); there is deliberately no default because a default
    * makes the collision the out-of-the-box behavior.
    */
  def foreachBatchIngest(storeRoot: String, tickPrefix: String,
                         minQuality: Double = 0.70,
                         threshold: Double = 0.5,
                         cap: Int = Dedup.MaxBucketSize)
                        (batch: DataFrame, batchId: Long): Unit = {
    require(tickPrefix.nonEmpty, "tickPrefix must be non-empty")
    if (!batch.isEmpty)
      CorpusStore.tick(batch, storeRoot,
        tickId = Some(s"$tickPrefix-$batchId"),
        minQuality = minQuality, threshold = threshold, cap = cap)
    ()
  }

  /** The streaming PLATFORM tick: documents arrive with their embeddings in
    * the same rows (an `embedding` array column alongside the document
    * columns), and each micro-batch runs [[CorpusStore.tickWithIndex]] —
    * corpus tick plus IVF index maintenance, all under one tick-marker
    * chain, so crash-replay re-lands exactly the commits that are missing
    * anywhere in the chain. The [[foreachBatchIngest]] checkpoint-lineage
    * contract applies doubly here (`tickPrefix` required, no default): a
    * colliding prefix from a new checkpoint lineage would silently skip
    * both the corpus append and the indexing of genuinely new batches.
    */
  def foreachBatchIngestWithIndex(storeRoot: String, ivfRoot: String,
                                  tickPrefix: String,
                                  refreshModel: Boolean = false,
                                  minQuality: Double = 0.70,
                                  threshold: Double = 0.5,
                                  cap: Int = Dedup.MaxBucketSize)
                                 (batch: DataFrame, batchId: Long): Unit = {
    require(tickPrefix.nonEmpty, "tickPrefix must be non-empty")
    if (!batch.isEmpty) {
      import org.apache.spark.sql.functions.col
      CorpusStore.tickWithIndex(
        batch.drop("embedding"),
        batch.select(col("doc_id").as("vec_id"), col("embedding")),
        storeRoot, ivfRoot, s"$tickPrefix-$batchId",
        refreshModel = refreshModel, minQuality = minQuality,
        threshold = threshold, cap = cap)
    }
    ()
  }
}
