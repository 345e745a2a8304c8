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

      // marker housekeeping: with ALL markers pruned (corpus AND ivf), a
      // re-delivered old tick still moves no version and appends no rows —
      // the corpus side drops every doc semantically, and the index side's
      // postings presence check (anyPosted) proves the tick already landed
      val pruned = CorpusStore.pruneTickMarkers(spark, root,
        olderThanMillis = 0L)
      assert(pruned == 6L, s"expected 6 pruned markers (3 corpus + 3 ivf), got $pruned")
      val r2 = CorpusStore.tickWithIndex(
        docs.filter(col("doc_id") % n === 1),
        emb.filter(col("vec_id") % n === 1), root, ivf, "wave1")
      assert(!r2.replaySkipped && r2.nKept == 0L,
        s"pruned-marker replay was not a semantic no-op: $r2")
      assert(ManifestTable.currentVersion(spark, s"$ivf/postings")
        .contains(pvBefore), "pruned-marker replay advanced the postings")
      assert(ManifestTable.currentVersion(spark, root).contains(vBefore))
      assert(sameRows(ManifestTable.read(spark, s"$ivf/postings")
        .select("vec_id"), keptIds),
        "pruned-marker replay changed the postings rows")
    } finally spark.catalog.clearCache()
  }

  test("tick scans plan only over batch-touched partitions (file pruning)") {
    import org.apache.spark.sql.functions.md5
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val root = java.nio.file.Files.createTempDirectory("graft_corpprune").toString
    try {
      (0 until 2).foreach { i =>
        CorpusStore.tick(docs.filter(col("doc_id") % 3 === i), root,
          tickId = Some(s"w$i"))
      }
      val dd = ManifestTable.dataDir(root)
      // resolve the layout FROM the store — the spec exercises the same
      // sidecar-resolution path every pruned production read goes through
      val lay = CorpusStore.layoutOf(spark, root)
      // a tiny arriving batch: the partition prune must shrink every store
      // scan to the buckets this batch touches
      val batch = docs.filter(col("doc_id").isin(2L, 5L))
      // touched buckets, via the SAME expressions the tick uses
      val mdBuckets = batch
        .select(CorpusStore.md5Bucket(md5(col("text")), lay).as("b"))
        .distinct().collect().map(_.getInt(0)).toSet
      val batchSigs = Dedup.shingleSignatures(batch)
      val bandBuckets = graft.operators.Dedup
        .explodedBands(batchSigs, Dedup.NumHashes / Dedup.NumBands)
        .select(CorpusStore.bandBucket(col("band_id"), col("band_val"), lay)
          .as("b"))
        .distinct().collect().map(_.getInt(0)).toSet

      def pruned(kind: String, buckets: Set[Int]) =
        CorpusStore.prunedKindFiles(spark, root, kind, buckets)
      def all(kind: String) = CorpusStore.kindFiles(spark, root, kind)

      // the prune is REAL: a 2-doc batch touches a strict subset of the
      // store's populated buckets on every axis (sf0.001's ~300 shingled
      // docs populate nearly all of the 16/64 bucket dirs)
      Seq(("doc", mdBuckets), ("band", bandBuckets)).foreach {
        case (kind, buckets) =>
          val (p, a) = (pruned(kind, buckets), all(kind))
          assert(a.size > 8, s"$kind kind unexpectedly small: ${a.size} files")
          assert(p.nonEmpty && p.size < a.size,
            s"$kind prune not effective: ${p.size} of ${a.size} files")
          assert(p.forall(f => buckets.exists(b =>
            f.startsWith(s"p_kind=$kind/p_b=$b/"))))
      }

      // dir-name ↔ expression consistency: the pruned band read contains
      // EXACTLY the store band rows whose bucket expression lands in the
      // touched set — if the write-side and read-side bucketing drifted,
      // the prune would silently lose candidates
      val prunedBands = spark.read.option("basePath", dd)
        .parquet(pruned("band", bandBuckets).map(f => s"$dd/$f"): _*)
        .select("doc_id", "band_id", "band_val")
      val expectBands = spark.read.option("basePath", dd)
        .parquet(all("band").map(f => s"$dd/$f"): _*)
        .filter(CorpusStore.bandBucket(col("band_id"), col("band_val"), lay)
          .isin(bandBuckets.toSeq: _*))
        .select("doc_id", "band_id", "band_val")
      assert(sameRows(prunedBands, expectBands),
        "pruned band read diverged from the bucket expression")

      // shingle-fetch prune: candidate doc_ids map to their bucket dirs
      val shBuckets = Set(2L % lay.shingleBuckets,
        5L % lay.shingleBuckets).map(_.toInt)
      val shPruned = pruned("sh", shBuckets)
      assert(shPruned.size < all("sh").size && shPruned.nonEmpty)
      val prunedSh = spark.read.option("basePath", dd)
        .parquet(shPruned.map(f => s"$dd/$f"): _*).select("doc_id")
      assert(prunedSh.filter(
        !CorpusStore.shingleBucket(col("doc_id"), lay)
          .isin(shBuckets.toSeq: _*))
        .isEmpty, "shingle bucket dirs hold out-of-bucket rows")
    } finally spark.catalog.clearCache()
  }

  test("transitively-dropped docs leave tombstones: exact redelivery is a no-op") {
    import spark.implicits._
    // The ADVICE counterexample, deterministic: a within-batch chain
    // O–X–C (jaccard(O,X) = jaccard(X,C) = 28/58 ≈ 0.483 ≥ 0.45;
    // jaccard(O,C) = 0) where only C (min doc_id) is kept. O was dropped
    // TRANSITIVELY — no store doc is a direct near-dup of O — so without
    // tombstones an exact redelivery of O would be re-appended. The token
    // seed (x36) is chosen so the 4-band LSH deterministically catches
    // both links (MinHash is md5-seeded; fixed texts → fixed bands).
    val w = (0 until 30).map(i => s"w${i}x36")
    val u = (0 until 30).map(i => s"u${i}x36")
    val cDoc = u.mkString(" ")
    val xDoc = (w ++ u).mkString(" ")
    val oDoc = w.mkString(" ")
    val root = java.nio.file.Files.createTempDirectory("graft_corptomb").toString
    val cols = Seq("doc_id", "lang", "source", "text")
    try {
      val r = CorpusStore.tick(
        Seq((1L, "en", "web", cDoc), (2L, "en", "web", xDoc),
          (3L, "en", "web", oDoc)).toDF(cols: _*),
        root, tickId = Some("t0"), minQuality = 0.0, threshold = 0.45)
      // precondition: the chain formed — one component {C, X, O}, C kept
      assert(r.nExactNew == 3L && r.nKept == 1L, s"fixture drifted: $r")
      assert(CorpusStore.docs(spark, root).select("doc_id").as[Long]
        .collect().toSeq == Seq(1L))
      // precondition: O does NOT near-dup any STORE doc (disjoint tokens
      // vs C) — the direct-match semantic replay alone would re-append it
      assert(Dedup.incrementalNearDups(
        Seq((3L, "en", "web", oDoc)).toDF(cols: _*),
        Dedup.shingleSignatures(CorpusStore.docs(spark, root)),
        threshold = 0.45).isEmpty,
        "fixture drifted: O direct-matches the store")

      // exact redelivery of O (marker-less): the tombstone catches it at
      // the exact stage — nothing commits, the store is byte-stable
      val v = graft.operators.ManifestTable.currentVersion(spark, root)
      val r2 = CorpusStore.tick(
        Seq((3L, "en", "web", oDoc)).toDF(cols: _*),
        root, minQuality = 0.0, threshold = 0.45)
      assert(r2.nExactNew == 0L && r2.nKept == 0L,
        s"redelivered transitively-dropped doc was not caught: $r2")
      assert(graft.operators.ManifestTable.currentVersion(spark, root) == v)
      assert(CorpusStore.docs(spark, root).count() == 1L)
    } finally spark.catalog.clearCache()
  }

  test("manifest model sidecars: cached refresh reuses staged models byte-identically") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val root = java.nio.file.Files.createTempDirectory("graft_corpmodels").toString
    try {
      (0 until 2).foreach { i =>
        CorpusStore.tick(docs.filter(col("doc_id") % 2 === i), root,
          tickId = Some(s"w$i"))
      }
      val plain = CorpusStore.manifest(spark, root)
        .orderBy("shard", "bin").collect().toSeq
      spark.catalog.clearCache()
      // first cached refresh derives AND stages the models
      val first = CorpusStore.manifestCached(spark, root)
        .orderBy("shard", "bin").collect().toSeq
      assert(first == plain, "staging pass diverged from the plain manifest")
      val v = ManifestTable.currentVersion(spark, root).get
      val mdir = new java.io.File(s"$root/_models/v$v")
      assert(new java.io.File(mdir, "_DONE").isFile, "sidecar _DONE missing")
      def sidecarState(): Map[String, Long] = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
        walk(mdir).map(f => f.getPath -> f.lastModified).toMap
      }
      val before = sidecarState()
      spark.catalog.clearCache()
      // second refresh at the same version LOADS the sidecars (no rewrite)
      // and produces the identical manifest
      val second = CorpusStore.manifestCached(spark, root)
        .orderBy("shard", "bin").collect().toSeq
      assert(second == plain, "cached refresh diverged from the plain manifest")
      assert(sidecarState() == before,
        "second refresh rewrote the model sidecars")
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
      val (nb, na) = CorpusStore.compact(spark, root,
        targetBytes = 1L << 30)
      assert(na <= nb, s"compaction grew the file count: $nb -> $na")
      assert(CorpusStore.read(spark, root)
        .orderBy("doc_id").collect().toSeq == before,
        "compaction changed store contents")
      val again = CorpusStore.tick(docs.filter(col("doc_id") % n === 2), root)
      assert(again.nKept == 0L,
        "replay against the compacted store was not a no-op")

      // marker housekeeping: pruned ids fall back to the semantic replay —
      // a re-delivered tick whose marker is gone still changes nothing.
      // Age cutoff 0 = "older than now" deletes every marker (retention is
      // an age, not a count, so coarse/tied mtimes cannot make a marker
      // inside the redelivery window lose to an older survivor)
      val deleted = CorpusStore.pruneTickMarkers(spark, root, olderThanMillis = 0L)
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
