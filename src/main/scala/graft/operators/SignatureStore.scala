package graft.operators

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Materialized dedup-signature staging — the cross-query form of the
  * amortization `Dedup`'s per-query persists perform within one plan
  * (SCALE.md's "staged signatures table").
  *
  * At 100 TB the tokenize→shingle→16-seeded-md5 pass over the corpus is by
  * far the most expensive step of every MinHash-family query, and it is
  * IDENTICAL across them. Build it ONCE per corpus snapshot as a
  * [[ManifestTable]] dataset; `q_minhash_lsh_pairs`-, `q_ngram_jaccard`-
  * and `q_dedup_groups`-shaped consumers then run off the compact staged
  * parquet (doc_id, shingles, sig_0..15) — each re-read is a column-pruned
  * scan of materialized state, never a recompute. This also dissolves the
  * persist-lifecycle question structurally: the shared state lives on disk
  * under snapshot isolation (atomic manifest commit, vacuum retention), not
  * in executor storage memory.
  */
object SignatureStore {

  /** Build (or refresh) the staged signature dataset for a corpus snapshot.
    * A rebuild commits a new snapshot atomically — readers pinned to the
    * previous one keep their files (ManifestTable retention). Returns the
    * committed version.
    */
  def build(docs: DataFrame, root: String): Long = {
    val spark = docs.sparkSession
    val staging = s"$root/_staging/${UUID.randomUUID()}"
    Dedup.shingleSignatures(docs).write.mode(SaveMode.Overwrite).parquet(staging)
    val added = ManifestTable.publishFiles(spark, root, staging)
    // empty prefix = replace the whole previous snapshot
    val version = ManifestTable.commitReplace(spark, root, Seq(""), added)
    // a rebuild is rare maintenance, so it carries the DEEP sweep (crash
    // orphans from died-before-commit ticks) — the same tick/compact split
    // as CorpusStore; the per-tick path below stays listing-free
    ManifestTable.vacuum(spark, root, deep = true)
    version
  }

  /** Latest staged snapshot. */
  def read(spark: SparkSession, root: String): DataFrame =
    ManifestTable.read(spark, root)

  /** One production dedup-ingest tick against the staged store: build the
    * incoming batch's signatures once, run [[Dedup.ingestTick]] (drop docs
    * near-dupping the store, then within-batch dedup of the survivors), and
    * APPEND the keepers' signature rows as a new snapshot — the state the
    * next batch dedups against. The store itself is never rewritten or
    * shuffled: the corpus side of the check is the broadcast-semi-join
    * prune of [[Dedup.incrementalNearDupsFromSigs]], and the commit adds
    * files without touching the previous snapshot's (readers pinned to it
    * keep their files — vacuum retention). Returns the committed version.
    *
    * Deduplicated against the same contract as [[Dedup.sequentialIngest]]:
    * running ticks over doc_id-split waves yields byte-identical store
    * contents (asserted in `SignatureStoreSpec`).
    */
  def ingestBatch(batchDocs: DataFrame, root: String,
                  threshold: Double = 0.5,
                  cap: Int = Dedup.MaxBucketSize): Long = {
    val spark = batchDocs.sparkSession
    val batchSigs = Dedup.shingleSignatures(batchDocs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // no snapshot yet = bootstrap tick: within-batch dedup only
    val store = ManifestTable.currentVersion(spark, root).map(_ => read(spark, root))
    // releaseIntermediate: a long-running ingest loop (StreamingDedup) runs
    // one tick per micro-batch — without the release every tick's internal
    // persist would accumulate in executor storage for the stream's lifetime
    val keep = Dedup.ingestTick(batchSigs, store, threshold, cap,
      releaseIntermediate = true)
    val staging = s"$root/_staging/${UUID.randomUUID()}"
    keep.write.mode(SaveMode.Overwrite).parquet(staging)
    val added = ManifestTable.publishFiles(spark, root, staging)
    // loud, never silent: staged keeper files vanishing before the publish
    // (external cleanup racing the tick) must fail the tick, not commit an
    // empty append while the caller believes the keepers landed
    require(added.nonEmpty || keep.isEmpty,
      "staged signature files vanished before publish — is another " +
        "writer's housekeeping running against this store?")
    val version = ManifestTable.commitReplace(spark, root, Seq.empty, added)
    // per-tick housekeeping must be LISTING-FREE: this runs once per
    // micro-batch under StreamingDedup, and the deep orphan sweep's
    // recursive data/ listing is O(store) driver work (an object-store LIST
    // storm) per tick; aged-out snapshots reclaim by manifest arithmetic
    // here, crash orphans wait for [[build]]-time maintenance
    ManifestTable.vacuum(spark, root, deep = false)
    keep.unpersist()
    batchSigs.unpersist()
    version
  }

  /** [[Dedup.minhashLshPairs]] off the stage: same banding, verification,
    * and bucket cap — byte-identical output to the self-contained query.
    */
  def minhashLshPairs(staged: DataFrame, threshold: Double = 0.5,
                      cap: Int = Dedup.MaxBucketSize): DataFrame =
    Dedup.pairsFromShingleSigs(staged,
      Dedup.NumHashes / Dedup.NumBands, threshold, cap)

  /** [[Dedup.ngramJaccardPairs]] off the stage (8×2 re-banding). */
  def ngramJaccardPairs(staged: DataFrame, threshold: Double = 0.3,
                        cap: Int = Dedup.MaxBucketSize): DataFrame =
    Dedup.pairsFromShingleSigs(staged, 2, threshold, cap)

  /** [[Dedup.dedupGroups]] off the stage. */
  def dedupGroups(staged: DataFrame, threshold: Double = 0.5): DataFrame =
    Dedup.connectedComponents(
      minhashLshPairs(staged, threshold)
        .select(org.apache.spark.sql.functions.col("doc_a"),
          org.apache.spark.sql.functions.col("doc_b")))
}
