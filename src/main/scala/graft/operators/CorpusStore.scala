package graft.operators

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The continuously-built training corpus as ONE disk-backed store — the
  * production composition of the whole curation suite, and the corpus twin
  * of [[Orchestrator]]'s market-data loop:
  *
  *   per arriving batch ([[tick]]): quality gate → within-batch exact dedup
  *   (first arrival wins) → exact-vs-store dedup (md5 anti-join, column-
  *   pruned) → greedy near-dup-vs-store ingest ([[Dedup.ingestTick]], the
  *   [[SignatureStore.ingestBatch]] kernel) → ONE atomic append of the
  *   keepers' full rows; on demand ([[manifest]]): the packed per-shard
  *   training manifest rebuilt from the accumulated keepers through the
  *   SAME stage 2–7 tail as [[Corpus.corpusPipeline]].
  *
  * One [[ManifestTable]] holds document columns AND dedup state per row
  * (doc_id, lang, source, text, text_md5, tick, shingles, sig_0..15), so a
  * tick is a SINGLE atomic snapshot commit — there is no window where the
  * dedup state and the document set disagree (the two-store alternative
  * loses documents on a crash between commits: replayed docs self-match
  * their own orphaned signatures). Consumers column-prune: the dedup side
  * of a tick reads only (doc_id, shingles, sig_*), the manifest rebuild
  * only (doc_id, lang, source, text), the exact check only text_md5.
  *
  * Convergence contract (spec-asserted): driving the doc_id % nWaves wave
  * slices through [[tick]] in arrival order yields a store — and a
  * [[manifest]] — identical to [[Corpus.corpusPipelineIncremental]] run
  * over the whole corpus at once. The exact stage differs mechanically
  * (the incremental build pre-dedups exact copies across ALL waves before
  * its fold; a tick can only see the store's KEPT md5s), but the outcomes
  * agree: a later exact copy of a kept doc drops at the md5 check, and a
  * later exact copy of a near-dup-DROPPED doc carries identical shingles,
  * so the same store match that disqualified the original disqualifies it
  * (shingle-less docs never drop at the near-dup stage, so their exact
  * copies are always caught by the md5 check).
  *
  * Replay safety (at-least-once delivery): a named tick that already rode
  * a committed snapshot is skipped by the `_ticks/` marker fast path; an
  * unnamed (or marker-lost) replay re-runs and drops every document at the
  * exact/near-dup checks — zero keepers commit nothing, so the store is
  * byte-stable under re-delivery either way (the
  * [[streaming.StreamingDedup]] contract, extended to the full row).
  *
  * Scale shape: per-tick work is O(batch + touched band buckets) — the
  * store is never rewritten (appends only), never reshuffled (the near-dup
  * corpus side is the broadcast-semi-join prune of
  * [[Dedup.incrementalNearDupsFromSigs]]; the exact check broadcasts the
  * batch's md5 set over the store's column-pruned text_md5 scan and
  * anti-joins the batch against the batch-bounded touched set — no store
  * exchange on either path). The manifest rebuild is one pipeline-tail
  * pass over the accumulated SURVIVORS (never the raw corpus): the
  * scrub/gate/decontamination stages are corpus-dependent — the LM trains
  * on a slice of the current corpus, the held-out set grows with it — so
  * freezing their per-tick results would silently diverge from the
  * all-at-once build this store is contractually convergent with; only
  * the budget/order/pack stages are metadata-scale. The rebuild runs per
  * loader refresh, amortized across however many ticks land in between.
  *
  * Housekeeping: per-tick appends fragment the store into batch-sized
  * files; [[Layout.compactTable]] over the root rewrites the snapshot to
  * target-size files atomically (rows, dedup state, and tick markers all
  * unchanged — spec-asserted), the same maintenance cadence any
  * streaming-ingest table runs.
  */
object CorpusStore {

  /** One tick's driver-side report: the committed (or reused) snapshot
    * version and the per-stage survivor counts — the funnel a production
    * ingest publishes per batch.
    */
  case class TickReport(version: Long, nRaw: Long, nQuality: Long,
                        nExactNew: Long, nKept: Long, replaySkipped: Boolean)

  private def sigCols: Seq[String] =
    (0 until Dedup.NumHashes).map(j => s"sig_$j")

  // the marker layout, in one place: every reader/writer goes through these
  private def fsOf(spark: SparkSession, root: String) =
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def markerDir(root: String, ns: String) =
    new org.apache.hadoop.fs.Path(s"$root/$ns")
  private def markerPath(root: String, ns: String, id: String) =
    new org.apache.hadoop.fs.Path(s"$root/$ns/$id")
  private def writeMarker(spark: SparkSession, root: String, ns: String,
                          id: String): Unit = {
    val fs = fsOf(spark, root)
    fs.mkdirs(markerDir(root, ns))
    fs.create(markerPath(root, ns, id)).close()
  }
  private def markerExists(spark: SparkSession, root: String, ns: String,
                           id: String): Boolean =
    fsOf(spark, root).exists(markerPath(root, ns, id))

  /** Latest store snapshot (full schema). */
  def read(spark: SparkSession, root: String): DataFrame =
    ManifestTable.read(spark, root)

  /** The kept documents of the latest snapshot — the frame [[manifest]]
    * and any downstream analysis consume (column-pruned scan).
    */
  def docs(spark: SparkSession, root: String): DataFrame =
    read(spark, root).select(col("doc_id"), col("lang"), col("source"),
      col("text"))

  /** Tick ids that have committed (one FS listing — observability; the
    * per-tick replay check uses an O(1) `exists` on the single marker).
    */
  def committedTicks(spark: SparkSession, root: String): Seq[String] = {
    val fs = fsOf(spark, root)
    val dir = markerDir(root, "_ticks")
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).map(_.getPath.getName).toSeq
  }

  /** Marker housekeeping: keep only the `keep` most recent CORPUS tick
    * markers (`_ticks/`, by marker mtime). Markers grow one file per named
    * tick forever otherwise; pruning the corpus namespace is safe because
    * that marker is only the FAST replay path — a re-delivered tick whose
    * marker was pruned falls back to the semantic replay (every document
    * drops at the exact/near-dup checks, zero keepers commit nothing;
    * spec-asserted byte-stable). Size `keep` to the delivery system's
    * maximum redelivery lag, the same reasoning as snapshot retention.
    *
    * `_ticks_ivf/` markers are deliberately NOT pruned: the index side has
    * no semantic-replay backstop (a re-delivered old tick would re-append
    * its postings — `IvfStore`'s guard only covers the current version),
    * so those markers are load-bearing for as long as a re-delivery is
    * possible at all. Returns markers deleted.
    */
  def pruneTickMarkers(spark: SparkSession, root: String,
                       keep: Int = 1000): Long = {
    require(keep >= 0, s"keep must be >= 0, got $keep")
    val fs = fsOf(spark, root)
    val dir = markerDir(root, "_ticks")
    if (!fs.exists(dir)) 0L
    else {
      val expired = fs.listStatus(dir).sortBy(-_.getModificationTime)
        .drop(keep)
      expired.foreach(st => fs.delete(st.getPath, false))
      expired.length.toLong
    }
  }

  /** Ingest one arriving batch of raw documents; returns the tick's
    * funnel counts and committed version. `tickId` (optional, `[A-Za-z0-9._-]+`)
    * enables the replay fast path; the marker is written AFTER the commit,
    * so a crash between commit and marker degrades to the (byte-stable)
    * semantic replay, never to loss or duplication.
    */
  def tick(rawBatch: DataFrame, root: String,
           tickId: Option[String] = None,
           minQuality: Double = 0.70,
           threshold: Double = 0.5,
           cap: Int = Dedup.MaxBucketSize): TickReport =
    tickCollecting(rawBatch, root, tickId, minQuality, threshold, cap,
      collectKeeperIds = false)._1

  /** [[tick]] plus the tick's keeper doc_ids collected to the driver
    * (batch-bounded, the broadcast-id-guard sizing contract) —
    * [[tickWithIndex]]'s fresh path consumes them so the index step needs
    * no store scan. Empty when skipped or when nothing was kept.
    */
  private def tickCollecting(rawBatch: DataFrame, root: String,
                             tickId: Option[String],
                             minQuality: Double,
                             threshold: Double,
                             cap: Int,
                             collectKeeperIds: Boolean)
      : (TickReport, Array[Long]) = {
    val spark = rawBatch.sparkSession
    tickId.foreach(id => require(id.matches("[A-Za-z0-9._-]+"),
      s"unsafe tick id: $id"))
    // version 0 = "store still empty" (a processed tick whose documents all
    // dropped leaves no snapshot; its marker alone records the delivery)
    val prev = ManifestTable.currentVersion(spark, root)
    if (tickId.exists(id => markerExists(spark, root, "_ticks", id)))
      return (TickReport(prev.getOrElse(0L), 0L, 0L, 0L, 0L,
        replaySkipped = true), Array.empty)

    val nRaw = rawBatch.count()
    // quality gate inside the scan stage, then within-batch exact dedup
    // (first arrival = min doc_id, one md5-keyed window — the
    // corpusPipelineIncremental stage shapes)
    val clean = rawBatch
      .filter(TextOps.qualityScore(col("text")) >= minQuality)
      .select(col("doc_id"), col("lang"), col("source"), col("text"),
        md5(col("text")).as("text_md5"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var exactP: DataFrame = null
    var batchSigs: DataFrame = null
    var keepSigs: DataFrame = null
    // try/finally: an at-least-once caller CATCHES and retries a failed
    // tick, so a mid-tick exception must not strand this attempt's caches
    // in executor storage (the IvfStore.build discipline)
    try {
      val nQuality = clean.count()
      val wExact = org.apache.spark.sql.expressions.Window
        .partitionBy(col("text_md5")).orderBy(col("doc_id"))
      val inBatch = clean
        .withColumn("__rn", row_number().over(wExact))
        .filter(col("__rn") === 1).drop("__rn")
      val store = prev.map(_ => read(spark, root))
      // exact-vs-store, in two broadcast steps so the store NEVER shuffles
      // (a direct left_anti against the store would hash-exchange the whole
      // corpus md5 column per tick): the batch's md5 set broadcasts into a
      // map-side semi-join over the store's column-pruned text_md5 scan —
      // the surviving "touched" set is batch-bounded — and the batch
      // anti-joins that broadcast. The StreamingDedup id-guard shape.
      val exact = store match {
        case Some(s) =>
          val touched = s.select(col("text_md5")).join(
            broadcast(inBatch.select(col("text_md5")).distinct()),
            Seq("text_md5"), "left_semi")
          inBatch.join(broadcast(touched), Seq("text_md5"), "left_anti")
        case None => inBatch
      }
      exactP = exact.persist(StorageLevel.MEMORY_AND_DISK)
      val nExactNew = exactP.count()
      batchSigs = Dedup.shingleSignatures(exactP)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val storeSigs = store.map(
        _.select((col("doc_id") +: col("shingles") +: sigCols.map(col)): _*))
      // releaseIntermediate: a production loop runs one tick per batch —
      // the fold's internal persist must not accumulate across ticks
      keepSigs = Dedup.ingestTick(batchSigs, storeSigs, threshold, cap,
        releaseIntermediate = true)
      // keepers' FULL rows: docs + their dedup state, one batch-scale join
      // (keepSigs is the keepers' full signature rows — doc_id, shingles,
      // sig_0..15 — per the ingestTick contract)
      val keepRows = exactP.join(keepSigs, Seq("doc_id"))
        .withColumn("tick", lit(tickId.getOrElse("untracked")))
      // zero keepers commit NOTHING: replay without a marker must leave the
      // version untouched, not mint empty snapshots (an empty DataFrame
      // write still produces an empty part file, so gate on the count, not
      // on the published file list)
      val nKept = keepSigs.count()
      val version =
        if (nKept == 0L) prev.getOrElse(0L)
        else {
          val staging = s"$root/_staging/${UUID.randomUUID()}"
          keepRows.write.mode(SaveMode.Overwrite).parquet(staging)
          val added = ManifestTable.publishFiles(spark, root, staging)
          val v = ManifestTable.commitReplace(spark, root, Seq.empty, added)
          ManifestTable.vacuum(spark, root)
          v
        }
      val keeperIds =
        if (collectKeeperIds && nKept > 0L)
          keepSigs.select(col("doc_id")).collect().map(_.getLong(0))
        else Array.empty[Long]
      tickId.foreach(id => writeMarker(spark, root, "_ticks", id))
      (TickReport(version, nRaw, nQuality, nExactNew, nKept,
        replaySkipped = false), keeperIds)
    } finally {
      clean.unpersist()
      if (exactP != null) exactP.unpersist()
      if (batchSigs != null) batchSigs.unpersist()
      // no-op on the bootstrap path (nothing cached)
      if (keepSigs != null) keepSigs.unpersist()
    }
  }

  /** The FULL platform tick: [[tick]] plus vector-index maintenance in one
    * production step. After the corpus tick, the batch's embeddings
    * restricted to the tick's KEPT doc_ids (`vec_id` = `doc_id`; the kept
    * set is batch-bounded, recovered from the store's `tick` column, so
    * the restriction broadcasts) flow into the staged IVF index: the first
    * kept batch trains and builds ([[IvfStore.build]]), later batches
    * append postings under the staged model — optionally after one
    * mini-batch model refresh ([[IvfStore.ingestBatch]]).
    *
    * Replay safety composes: the corpus tick skips (marker) or no-ops
    * (semantic), the kept set re-derives from committed store rows either
    * way, and the SAME tick id rides the IVF postings/model commit guards
    * — so a crash anywhere in the chain re-lands exactly the commits that
    * are missing, never a double-append (the bootstrap build stamps the
    * marker too). A tick id is therefore REQUIRED here, unlike [[tick]].
    */
  def tickWithIndex(rawBatch: DataFrame, batchEmb: DataFrame,
                    root: String, ivfRoot: String, tickId: String,
                    refreshModel: Boolean = false,
                    minQuality: Double = 0.70,
                    threshold: Double = 0.5,
                    cap: Int = Dedup.MaxBucketSize): TickReport = {
    val spark = rawBatch.sparkSession
    val (r, keeperIds) = tickCollecting(rawBatch, root, Some(tickId),
      minQuality, threshold, cap, collectKeeperIds = true)
    if (ManifestTable.currentVersion(spark, root).isEmpty) return r
    // composed-tick marker (own `_ticks_ivf/` namespace): IvfStore's guard
    // covers only the CURRENT postings version's marker — enough for the
    // immediate replay at-least-once delivers, but a re-delivery arriving
    // after LATER ticks have committed would re-append an old batch. Later
    // ticks can only run once this one completed (marker included), so the
    // marker is always present exactly when the current-version guard no
    // longer covers the tick. NOT pruned by [[pruneTickMarkers]] — the
    // index side has no semantic-replay backstop.
    if (!markerExists(spark, root, "_ticks_ivf", tickId)) {
      import spark.implicits._
      // fresh path: the tick just collected its keeper ids (batch-bounded)
      // — no store scan. Replay/retry path (corpus tick skipped or its
      // keeper collection lost): re-derive from the committed store rows'
      // tick column, the correctness fallback.
      val keptIds =
        if (keeperIds.nonEmpty) keeperIds.toSeq.toDF("vec_id")
        else read(spark, root).filter(col("tick") === tickId)
          .select(col("doc_id").as("vec_id"))
      val keptVecs =
        batchEmb.join(broadcast(keptIds), Seq("vec_id"), "left_semi")
      if (!keptVecs.isEmpty) {
        if (!IvfStore.isBuilt(spark, ivfRoot))
          IvfStore.build(keptVecs, ivfRoot, tickId = Some(tickId))
        else
          IvfStore.ingestBatch(keptVecs, ivfRoot, refreshModel, Some(tickId))
      }
      writeMarker(spark, root, "_ticks_ivf", tickId)
    }
    r
  }

  /** The packed (shard, bin) training manifest over the accumulated
    * keepers — [[Corpus.corpusPipeline]]'s stage 2–7 tail off the store
    * (identical output to the all-at-once incremental build when the
    * ticks were its arrival waves; spec-asserted).
    *
    * Cache lifecycle: the tail persists its multiply-consumed stage frames
    * under the session-cache contract — a long-running caller materializes
    * the manifest, then clears the session cache (or runs each refresh in
    * its own session), unlike [[tick]], which releases its own caches.
    */
  def manifest(spark: SparkSession, root: String,
               perplexityThreshold: Double = 3.5,
               flagAt: Double = 0.2,
               totalBudget: Long = 20000L,
               nShards: Int = 8,
               seqBudget: Long = 1024L,
               seed: String = "graft"): DataFrame =
    Corpus.pipelineTail(docs(spark, root), perplexityThreshold, flagAt,
      totalBudget, nShards, seqBudget, seed)

  /** [[manifest]] over a PINNED store snapshot — the byte-reproducible
    * rebuild of the manifest a past loader refresh saw (the tail is a
    * deterministic function of the snapshot's rows, and a snapshot's files
    * are immutable while the retention window holds them). The training-
    * reproducibility read: "which exact (shard, bin) packing did version v
    * train on".
    */
  def manifestAt(spark: SparkSession, root: String, version: Long,
                 perplexityThreshold: Double = 3.5,
                 flagAt: Double = 0.2,
                 totalBudget: Long = 20000L,
                 nShards: Int = 8,
                 seqBudget: Long = 1024L,
                 seed: String = "graft"): DataFrame =
    Corpus.pipelineTail(
      ManifestTable.readAt(spark, root, version)
        .select(col("doc_id"), col("lang"), col("source"), col("text")),
      perplexityThreshold, flagAt, totalBudget, nShards, seqBudget, seed)
}
