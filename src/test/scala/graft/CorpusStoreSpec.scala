package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.operators.{Corpus, CorpusStore, Dedup, ManifestTable}

class CorpusStoreSpec extends SparkSpec {

  private def sameRows(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("orchestrated ticks converge to the all-at-once incremental build") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val root = java.nio.file.Files.createTempDirectory("graft_corpstore").toString
    var midManifest: Seq[org.apache.spark.sql.Row] = Seq.empty
    try {
      val n = 3
      val reports = (0 until n).map { i =>
        val r = CorpusStore.tick(docs.filter(col("doc_id") % n === i), root,
          tickId = Some(s"wave$i"))
        // snapshot of the manifest a loader refreshing at this version saw
        if (i == 1) midManifest = CorpusStore.manifest(spark, root)
          .orderBy("shard", "bin").collect().toSeq
        r
      }
      assert(reports.map(_.version) == Seq(1L, 2L, 3L))
      assert(reports.forall(!_.replaySkipped))

      // time travel: the pinned-snapshot rebuild reproduces the manifest
      // exactly as it stood at version 2, after version 3 landed
      assert(CorpusStore.manifestAt(spark, root, 2L)
        .orderBy("shard", "bin").collect().toSeq == midManifest,
        "manifestAt(v2) diverged from the manifest computed at v2")
      // funnel counts are internally consistent per tick
      reports.foreach { r =>
        assert(r.nRaw >= r.nQuality && r.nQuality >= r.nExactNew
          && r.nExactNew >= r.nKept, s"non-monotone funnel: $r")
      }

      // the store's kept documents = the incremental pipeline's survivors:
      // quality gate + (wave, doc_id)-ordered exact pre-dedup + greedy
      // sequential near-dup fold over the SAME wave slices
      val clean = docs
        .filter(graft.operators.TextOps.qualityScore(col("text")) >= 0.70)
      val wExact = org.apache.spark.sql.expressions.Window
        .partitionBy(org.apache.spark.sql.functions.md5(col("text")))
        .orderBy(col("doc_id") % n, col("doc_id"))
      val exact = clean
        .withColumn("__rn",
          org.apache.spark.sql.functions.row_number().over(wExact))
        .filter(col("__rn") === 1).drop("__rn")
      val expectIds = Dedup.sequentialIngest(exact, n).select("doc_id")
      assert(sameRows(CorpusStore.docs(spark, root).select("doc_id"), expectIds),
        "store keeper set diverged from the sequential-fold contract")

      // ...and the packed manifest equals the all-at-once incremental build
      assert(sameRows(CorpusStore.manifest(spark, root),
        Corpus.corpusPipelineIncremental(docs, n)),
        "store-backed manifest diverged from corpusPipelineIncremental")
    } finally spark.catalog.clearCache()
  }

  test("platform tick maintains the IVF index alongside the corpus") {
    import graft.operators.IvfStore
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val root = java.nio.file.Files.createTempDirectory("graft_platform").toString
    val ivf = java.nio.file.Files.createTempDirectory("graft_platform_ivf").toString
    try {
      val n = 3
      (0 until n).foreach { i =>
        CorpusStore.tickWithIndex(
          docs.filter(col("doc_id") % n === i),
          emb.filter(col("vec_id") % n === i),
          root, ivf, s"wave$i")
      }
      // every kept document's vector is indexed — nothing more, nothing less
      val keptIds = CorpusStore.docs(spark, root)
        .select(col("doc_id").as("vec_id"))
      val postedIds = ManifestTable.read(spark, s"$ivf/postings")
        .select("vec_id")
      assert(sameRows(postedIds, keptIds),
        "IVF postings diverged from the kept document set")

      // replay of an old tick after later ticks: the composed marker skips
      // the index step — no double-append, no version movement anywhere
      val pvBefore = ManifestTable.currentVersion(spark, s"$ivf/postings").get
      val vBefore = ManifestTable.currentVersion(spark, root).get
      val r = CorpusStore.tickWithIndex(
        docs.filter(col("doc_id") % n === 0),
        emb.filter(col("vec_id") % n === 0), root, ivf, "wave0")
      assert(r.replaySkipped)
      assert(ManifestTable.currentVersion(spark, s"$ivf/postings")
        .contains(pvBefore), "replay advanced the postings")
      assert(ManifestTable.currentVersion(spark, root).contains(vBefore))
      assert(sameRows(ManifestTable.read(spark, s"$ivf/postings")
        .select("vec_id"), keptIds), "replay changed the postings rows")
    } finally spark.catalog.clearCache()
  }

  test("store ticks leave no cached state behind (long-running loop safety)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val root = java.nio.file.Files.createTempDirectory("graft_corpleak").toString
    spark.catalog.clearCache()
    (0 until 2).foreach { i =>
      CorpusStore.tick(docs.filter(col("doc_id") % 2 === i), root,
        tickId = Some(s"t$i"))
    }
    val leaked = spark.sparkContext.getPersistentRDDs
    assert(leaked.isEmpty,
      s"a tick leaked ${leaked.size} cached RDD(s): " +
        leaked.values.map(_.name).mkString(", "))
  }

  test("replayed ticks are byte-stable: marker fast path and semantic no-op") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val root = java.nio.file.Files.createTempDirectory("graft_corpreplay").toString
    try {
      val n = 3
      (0 until n).foreach { i =>
        CorpusStore.tick(docs.filter(col("doc_id") % n === i), root,
          tickId = Some(s"wave$i"))
      }
      val before = CorpusStore.read(spark, root)
        .orderBy("doc_id").collect().toSeq
      val vBefore = ManifestTable.currentVersion(spark, root).get

      // marker fast path: same tick id skips before any work
      val fast = CorpusStore.tick(docs.filter(col("doc_id") % n === 1), root,
        tickId = Some("wave1"))
      assert(fast.replaySkipped && fast.version == vBefore)

      // semantic path: NO tick id — every doc drops at the exact/near-dup
      // checks, zero keepers commit nothing, version untouched
      val slow = CorpusStore.tick(docs.filter(col("doc_id") % n === 1), root)
      assert(!slow.replaySkipped && slow.nKept == 0L
        && slow.version == vBefore,
        s"unnamed replay was not a no-op: $slow")
      assert(ManifestTable.currentVersion(spark, root).contains(vBefore))
      assert(CorpusStore.read(spark, root)
        .orderBy("doc_id").collect().toSeq == before,
        "replay changed store contents")

      // housekeeping: compaction rewrites the fragmented per-tick files
      // without changing rows, and a replayed tick against the compacted
      // store is still a semantic no-op (the dedup state survived intact)
      val (nb, na) = graft.operators.Layout.compactTable(spark, root,
        targetBytes = 1L << 30)
      assert(na <= nb, s"compaction grew the file count: $nb -> $na")
      assert(CorpusStore.read(spark, root)
        .orderBy("doc_id").collect().toSeq == before,
        "compaction changed store contents")
      val again = CorpusStore.tick(docs.filter(col("doc_id") % n === 2), root)
      assert(again.nKept == 0L,
        "replay against the compacted store was not a no-op")

      // marker housekeeping: pruned ids fall back to the semantic replay —
      // a re-delivered tick whose marker is gone still changes nothing
      // keep = 0 so the surviving set is deterministic (same-second mtimes
      // make "which marker survives keep=1" ambiguous)
      val deleted = CorpusStore.pruneTickMarkers(spark, root, keep = 0)
      assert(deleted == 3L, s"expected 3 pruned markers, got $deleted")
      assert(CorpusStore.committedTicks(spark, root).isEmpty)
      val vNow = ManifestTable.currentVersion(spark, root)
      val pruned = CorpusStore.tick(
        docs.filter(col("doc_id") % n === 0), root, tickId = Some("wave0"))
      assert(!pruned.replaySkipped && pruned.nKept == 0L
        && ManifestTable.currentVersion(spark, root) == vNow,
        s"pruned-marker replay was not a semantic no-op: $pruned")
    } finally spark.catalog.clearCache()
  }
}
