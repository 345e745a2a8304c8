package graft

import org.apache.spark.sql.DataFrame

import graft.operators.{Dedup, ManifestTable, SignatureStore}

class SignatureStoreSpec extends SparkSpec {

  private def sameRows(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("staged consumers are byte-identical to the self-contained queries") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val root = java.nio.file.Files.createTempDirectory("graft_sigstore").toString
    try {
      val v1 = SignatureStore.build(docs, root)
      assert(v1 == 1L)
      val staged = SignatureStore.read(spark, root)
      assert(staged.columns.toSeq ==
        "doc_id" +: "shingles" +: (0 until Dedup.NumHashes).map(j => s"sig_$j"))

      assert(sameRows(SignatureStore.minhashLshPairs(staged),
        Dedup.minhashLshPairs(docs)), "minhash pairs diverged")
      assert(sameRows(SignatureStore.ngramJaccardPairs(staged),
        Dedup.ngramJaccardPairs(docs)), "ngram pairs diverged")
      assert(sameRows(SignatureStore.dedupGroups(staged),
        Dedup.dedupGroups(docs)), "dedup groups diverged")

      // rebuild: new snapshot, previous retained for pinned readers
      val v2 = SignatureStore.build(docs, root)
      assert(v2 == 2L)
      assert(ManifestTable.versions(spark, root) == Seq(1L, 2L))
      assert(sameRows(SignatureStore.read(spark, root), staged))
    } finally spark.catalog.clearCache()
  }

  test("ingestBatch ticks reproduce sequentialIngest's kept set exactly") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val root = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    try {
      val n = 3
      var tick1Files: Seq[String] = Seq.empty
      (0 until n).foreach { i =>
        val v = SignatureStore.ingestBatch(docs.filter(col("doc_id") % n === i), root)
        assert(v == i + 1L, s"tick $i committed version $v")
        if (i == 0) tick1Files = ManifestTable.liveFiles(spark, root)
      }
      val storeIds = SignatureStore.read(spark, root).select("doc_id")
      val pureIds = Dedup.sequentialIngest(docs, n).select("doc_id")
      assert(sameRows(storeIds, pureIds),
        "store-backed ingest diverged from the pure sequential fold")
      // every batch tick appends, never rewrites: tick-1 files still live
      val live = ManifestTable.liveFiles(spark, root)
      assert(tick1Files.nonEmpty && tick1Files.forall(live.contains),
        "append tick dropped prior files")
    } finally spark.catalog.clearCache()
  }

  test("staged cleanCorpusStats equals the self-contained pipeline") {
    import graft.operators.Corpus
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val root = java.nio.file.Files.createTempDirectory("graft_ccstage").toString
    try {
      SignatureStore.build(docs, root)
      val staged = SignatureStore.read(spark, root)
      assert(sameRows(Corpus.cleanCorpusStatsStaged(docs, staged),
        Corpus.cleanCorpusStats(docs)), "staged corpus-clean diverged")
    } finally spark.catalog.clearCache()
  }

  test("staged corpusPipeline equals the self-contained flagship manifest") {
    import graft.operators.Corpus
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val root = java.nio.file.Files.createTempDirectory("graft_cpstage").toString
    try {
      SignatureStore.build(docs, root)
      val staged = SignatureStore.read(spark, root)
      assert(sameRows(Corpus.corpusPipelineStaged(docs, staged),
        Corpus.corpusPipeline(docs)), "staged corpus pipeline diverged")
    } finally spark.catalog.clearCache()
  }

  test("ingestBatch drops within-batch near-dups, not just store matches") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_ingest2").toString
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val oneOff = (1 to 40).map(i => if (i == 3) "X" else s"w$i").mkString(" ")
    def frame(rows: (Long, String)*) =
      rows.map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    try {
      // bootstrap tick: 11 and 12 near-dup each other -> keep min (11)
      SignatureStore.ingestBatch(frame((11L, base), (12L, oneOff)), root)
      val kept1 = SignatureStore.read(spark, root)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(kept1 == Seq(11L))
      // second tick: 21 dups the store, 22 is novel -> only 22 appended
      SignatureStore.ingestBatch(frame((21L, base),
        (22L, (100 to 140).map(i => s"z$i").mkString(" "))), root)
      val kept2 = SignatureStore.read(spark, root)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(kept2 == Seq(11L, 22L))
    } finally spark.catalog.clearCache()
  }

  test("per-tick housekeeping is listing-free: a crash orphan survives " +
    "every ingest tick and falls to build()-time deep maintenance") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val root = java.nio.file.Files.createTempDirectory("graft_ingest3").toString
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def onDisk(rel: String): Boolean =
      fs.exists(new org.apache.hadoop.fs.Path(
        s"${ManifestTable.dataDir(root)}/$rel"))
    try {
      SignatureStore.ingestBatch(docs.filter(col("doc_id") % 3 === 0), root)
      // a crash orphan: published by a writer that died before its commit
      val staging = s"$root/_staging/${java.util.UUID.randomUUID()}"
      spark.range(5).toDF("x").coalesce(1)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(staging)
      val orphan = ManifestTable.publishFiles(spark, root, staging)
      assert(orphan.nonEmpty && orphan.forall(onDisk))
      // the streaming-tick path must not pay a recursive data/ listing, so
      // the orphan survives however many ticks run...
      SignatureStore.ingestBatch(docs.filter(col("doc_id") % 3 === 1), root)
      SignatureStore.ingestBatch(docs.filter(col("doc_id") % 3 === 2), root)
      assert(orphan.forall(onDisk),
        "an ingest tick swept a crash orphan — it must not list data/")
      // ...and the rare full rebuild carries the deep sweep
      SignatureStore.build(docs, root)
      assert(orphan.forall(f => !onDisk(f)),
        "build()-time deep maintenance left the crash orphan")
    } finally spark.catalog.clearCache()
  }
}
