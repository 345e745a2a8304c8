package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions.{col, md5}

import graft.operators.{CorpusStore, ManifestTable}
import graft.operators.CorpusStore.StoreLayout

/** The per-file Bloom sidecars — level 2 of the tick's file prune. Level 1
  * (bucket dirs) bounds the read to O(touched buckets); the blooms then
  * skip the files inside a touched bucket that provably hold none of the
  * batch's keys, which is the common case for a mostly-fresh batch. The
  * safety property is asymmetric and these specs pin both sides: a skip is
  * only ever justified by a negative probe (no false negatives, so a
  * duplicate's file can NEVER be skipped), while a kept file costs only
  * performance.
  */
class CorpusStoreBloomSpec extends SparkSpec {

  /** (key → bucket) map for md5-kind probes, via the store's own exprs. */
  private def md5KeysByBucket(df: org.apache.spark.sql.DataFrame,
                              lay: StoreLayout): Map[Int, Seq[String]] =
    df.select(md5(col("text")).as("k"),
      CorpusStore.md5Bucket(md5(col("text")), lay).as("b"))
      .distinct().collect()
      .groupBy(_.getInt(1))
      .map { case (b, rows) => b -> rows.toSeq.map(_.getString(0)) }

  test("every probed kind's manifest entry carries a bloom; fresh keys " +
    "skip whole buckets' files, present keys never skip theirs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val root = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    try {
      (0 until 2).foreach { i =>
        CorpusStore.tick(docs.filter(col("doc_id") % 3 === i), root,
          tickId = Some(s"w$i"))
      }
      val lay = CorpusStore.layoutOf(spark, root)
      val entries = ManifestTable.liveEntries(spark, root)
      Seq("doc", "band").foreach { kind =>
        val of = entries.filter(_.path.startsWith(s"p_kind=$kind/"))
        assert(of.nonEmpty && of.forall(_.bloom.nonEmpty),
          s"$kind entries missing bloom sidecars")
      }
      // sh is deliberately bloom-less (fetched by post-join candidates)
      assert(entries.filter(_.path.startsWith("p_kind=sh/"))
        .forall(_.bloom.isEmpty))

      // a PRESENT key (a store doc's md5): its file must survive the
      // bloom prune, and reading the pruned set must surface the key —
      // the no-false-negative half, the one dedup correctness rests on.
      // Taken from the store's own rows, so the probe is present by
      // construction whatever the quality/dedup gates dropped upstream.
      val present = md5KeysByBucket(
        CorpusStore.docs(spark, root).orderBy("doc_id").limit(1), lay)
      val hitFiles = CorpusStore.bloomPrunedKindFiles(spark, root, "doc",
        present)
      assert(hitFiles.nonEmpty, "present key's file was bloom-skipped")
      val dd = ManifestTable.dataDir(root)
      val got = spark.read.option("basePath", dd)
        .parquet(hitFiles.map(f => s"$dd/$f"): _*)
        .filter(col("text_md5").isin(present.values.flatten.toSeq: _*))
      assert(!got.isEmpty, "pruned read lost the present key's row")

      // FRESH keys (texts the store has never seen), spread over many
      // buckets: the dir prune alone would read every touched bucket's
      // files; the blooms drop them all (fixed texts → deterministic)
      import spark.implicits._
      val fresh = (0 until 20)
        .map(i => s"graft bloom probe document number $i entirely novel")
        .toDF("text")
      val freshKeys = md5KeysByBucket(fresh, lay)
      val dirPruned = CorpusStore.prunedKindFiles(spark, root, "doc",
        freshKeys.keySet)
      val bloomPruned = CorpusStore.bloomPrunedKindFiles(spark, root, "doc",
        freshKeys)
      assert(dirPruned.nonEmpty, "probe buckets unexpectedly empty")
      assert(bloomPruned.isEmpty,
        s"fresh-key probe read ${bloomPruned.size} of ${dirPruned.size} " +
          "dir-pruned files — blooms not skipping")
    } finally spark.catalog.clearCache()
  }

  test("bloom sidecars survive incremental compaction and rebucket " +
    "(rewritten files get fresh, exactly-sized filters)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val root = java.nio.file.Files.createTempDirectory("graft_bloomc").toString
    try {
      (0 until 3).foreach { i =>
        CorpusStore.tick(docs.filter(col("doc_id") % 3 === i), root,
          tickId = Some(s"w$i"))
      }
      def checkProbes(): Unit = {
        val lay = CorpusStore.layoutOf(spark, root)
        val entries = ManifestTable.liveEntries(spark, root)
        Seq("doc", "band").foreach { kind =>
          val of = entries.filter(_.path.startsWith(s"p_kind=$kind/"))
          assert(of.nonEmpty && of.forall(_.bloom.nonEmpty),
            s"$kind lost bloom sidecars")
        }
        val present = md5KeysByBucket(
          CorpusStore.docs(spark, root).orderBy("doc_id").limit(1), lay)
        assert(CorpusStore.bloomPrunedKindFiles(spark, root, "doc", present)
          .nonEmpty, "present key's file was bloom-skipped")
        import spark.implicits._
        val fresh = (0 until 20)
          .map(i => s"graft bloom probe document number $i entirely novel")
          .toDF("text")
        assert(CorpusStore.bloomPrunedKindFiles(spark, root, "doc",
          md5KeysByBucket(fresh, lay)).isEmpty,
          "fresh-key probe not skipped after rewrite")
      }
      checkProbes()
      CorpusStore.compact(spark, root, targetBytes = 1L << 30)
      checkProbes()
      CorpusStore.compact(spark, root,
        rebucketTo = Some(StoreLayout(32, 32, 32)))
      checkProbes()
      // dedup state still sound through both rewrites: a semantic replay
      // of already-ingested docs commits nothing
      val v = ManifestTable.currentVersion(spark, root)
      val rep = CorpusStore.tick(docs.filter(col("doc_id") % 3 === 1), root)
      assert(rep.nKept == 0L && ManifestTable.currentVersion(spark, root) == v,
        s"replay through bloom-pruned reads was not a no-op: $rep")
    } finally spark.catalog.clearCache()
  }

  test("manifest lines round-trip stats and blooms together, and old " +
    "bare/stats-only lines still parse") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_bloomrt").toString
    val staging = s"$root/_staging/${java.util.UUID.randomUUID()}"
    (0L to 99L).toDF("seq").withColumn("k", md5(col("seq").cast("string")))
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(staging)
    val added = ManifestTable.publishFiles(spark, root, staging)
    val dd = ManifestTable.dataDir(root)
    val stats = ManifestTable.footerMeta(spark, dd, added, Seq("seq"))
    val blooms = ManifestTable.fileBlooms(spark, dd, added, "k")
    val entries = stats.map { case (e, _) =>
      e.copy(bloom = blooms.get(e.path)) }
    assert(entries.forall(e => e.stats.contains("seq") && e.bloom.nonEmpty))
    ManifestTable.commitEntries(spark, root, Seq.empty, entries)
    val back = ManifestTable.liveEntries(spark, root)
    assert(back.map(e => (e.path, e.stats, e.bloom)).sortBy(_._1) ==
      entries.map(e => (e.path, e.stats, e.bloom)).sortBy(_._1),
      "stats+bloom line did not round-trip")
    // the decoded filter answers probes exactly as the builder's would
    val bf = ManifestTable.decodeBloom(back.head.bloom.get)
    val k3 = spark.range(3, 4).select(md5(col("id").cast("string")))
      .collect()(0).getString(0)
    assert(bf.mightContainString(k3))
    // a second commit replacing nothing keeps the carried lines verbatim
    ManifestTable.commitReplace(spark, root, Seq.empty, Seq.empty)
    assert(ManifestTable.liveEntries(spark, root)
      .map(e => (e.path, e.stats, e.bloom)).sortBy(_._1) ==
      entries.map(e => (e.path, e.stats, e.bloom)).sortBy(_._1),
      "carried-forward line lost its bloom")
  }
}
