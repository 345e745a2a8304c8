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

  /** (doc_id → bucket) map for sh-kind probes, via the store's own expr. */
  private def idKeysByBucket(ids: Seq[Long],
                             lay: StoreLayout): Map[Int, Seq[String]] = {
    import spark.implicits._
    ids.toDF("doc_id")
      .select(col("doc_id"),
        CorpusStore.shingleBucket(col("doc_id"), lay).as("b"))
      .collect()
      .groupBy(_.getInt(1))
      .map { case (b, rows) => b -> rows.toSeq.map(_.getLong(0).toString) }
  }

  test("every probed kind's live file has a bloom sidecar; fresh keys " +
    "skip whole buckets' files, present keys never skip theirs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val root = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    try {
      (0 until 2).foreach { i =>
        CorpusStore.tick(docs.filter(col("doc_id") % 3 === i), root,
          tickId = Some(s"w$i"))
      }
      val lay = CorpusStore.layoutOf(spark, root)
      val files = ManifestTable.liveFiles(spark, root)
      Seq("doc", "band", "sh").foreach { kind =>
        val of = files.filter(_.startsWith(s"p_kind=$kind/"))
        assert(of.nonEmpty && of.forall(f =>
          ManifestTable.readBloom(spark, root, f).nonEmpty),
          s"$kind files missing bloom sidecars")
      }

      // the sh kind probes by doc_id (the verification fetch's key): a
      // kept doc's shingle file survives the prune and the pruned read
      // surfaces its row; doc_ids the store never kept skip everything
      // their buckets hold
      val keptId = CorpusStore.docs(spark, root)
        .orderBy("doc_id").limit(1).collect()(0).getLong(0)
      val shHit = CorpusStore.bloomPrunedKindFiles(spark, root, "sh",
        idKeysByBucket(Seq(keptId), lay))
      assert(shHit.nonEmpty, "kept doc's shingle file was bloom-skipped")
      val ddSh = ManifestTable.dataDir(root)
      assert(!spark.read.option("basePath", ddSh)
        .parquet(shHit.map(f => s"$ddSh/$f"): _*)
        .filter(col("doc_id") === keptId).isEmpty,
        "pruned shingle read lost the kept doc's rows")
      // not exactly-empty: ~20 probes at fpp 0.01 can legitimately hit a
      // false positive under a different partitioning or hash seed, and a
      // false positive costs one spurious file read, not correctness. The
      // claim is the PRUNE: nearly all dir-pruned files are skipped.
      val neverIds = idKeysByBucket(1000000L until 1000020L, lay)
      val shDirPruned = CorpusStore.prunedKindFiles(spark, root, "sh",
        neverIds.keySet)
      val shBloomPruned = CorpusStore.bloomPrunedKindFiles(spark, root, "sh",
        neverIds)
      assert(shDirPruned.nonEmpty, "sh probe buckets unexpectedly empty")
      assert(shBloomPruned.size <= math.max(1, shDirPruned.size / 4),
        s"never-kept doc_ids read ${shBloomPruned.size} of " +
          s"${shDirPruned.size} dir-pruned shingle files — sh blooms not " +
          "skipping")

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
      // same fraction bound as the sh probe above: no exactly-empty
      // requirement riding on false-positive luck
      assert(bloomPruned.size <= math.max(1, dirPruned.size / 4),
        s"fresh-key probe read ${bloomPruned.size} of ${dirPruned.size} " +
          "dir-pruned files — blooms not skipping")
    } finally spark.catalog.clearCache()
  }

  test("bloom sidecars survive incremental compaction and rebucket " +
    "(rewritten files get fresh, re-sized filters)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val root = java.nio.file.Files.createTempDirectory("graft_bloomc").toString
    try {
      (0 until 3).foreach { i =>
        CorpusStore.tick(docs.filter(col("doc_id") % 3 === i), root,
          tickId = Some(s"w$i"))
      }
      def checkProbes(): Unit = {
        val lay = CorpusStore.layoutOf(spark, root)
        val files = ManifestTable.liveFiles(spark, root)
        Seq("doc", "band", "sh").foreach { kind =>
          val of = files.filter(_.startsWith(s"p_kind=$kind/"))
          assert(of.nonEmpty && of.forall(f =>
            ManifestTable.readBloom(spark, root, f).nonEmpty),
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
        val freshKeys = md5KeysByBucket(fresh, lay)
        val dirPruned = CorpusStore.prunedKindFiles(spark, root, "doc",
          freshKeys.keySet)
        val bloomPruned = CorpusStore.bloomPrunedKindFiles(spark, root,
          "doc", freshKeys)
        assert(bloomPruned.size <= math.max(1, dirPruned.size / 4),
          s"fresh-key probe read ${bloomPruned.size} of ${dirPruned.size} " +
            "dir-pruned files after rewrite — blooms not skipping")
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

      // vacuum sweeps dead files' sidecars with them: down to only the
      // current snapshot, what's on disk under _blooms is EXACTLY the
      // live probed-kind files' sidecars
      ManifestTable.vacuum(spark, root, retainLast = 1)
      val bloomsDir = new org.apache.hadoop.fs.Path(s"$root/_blooms")
      val fs = bloomsDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val qualified = fs.makeQualified(bloomsDir)
      val onDisk = scala.collection.mutable.Set.empty[String]
      val it = fs.listFiles(qualified, true)
      while (it.hasNext)
        onDisk += qualified.toUri.relativize(it.next().getPath.toUri).getPath
      val probedLive = ManifestTable.liveFiles(spark, root)
        .filter(f => Seq("doc", "tomb", "band", "sh")
          .exists(k => f.startsWith(s"p_kind=$k/"))).toSet
      assert(onDisk.map(_.stripSuffix(".bloom")) == probedLive,
        s"vacuum left sidecars out of step with live files: " +
          s"${onDisk.size} on disk vs ${probedLive.size} live")
    } finally spark.catalog.clearCache()
  }

  test("bloom sidecars round-trip through the filesystem; a file without " +
    "one reads None (always kept); legacy manifest tail fields parse") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_bloomrt").toString
    val staging = s"$root/_staging/${java.util.UUID.randomUUID()}"
    (0L to 99L).toDF("seq").withColumn("k", md5(col("seq").cast("string")))
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(staging)
    val added = ManifestTable.publishFiles(spark, root, staging)
    // sidecars land BEFORE the commit (the writers' protocol — readBloom
    // caches misses on the strength of it)
    ManifestTable.writeFileBlooms(spark, root, added, "k")
    ManifestTable.commitReplace(spark, root, Seq.empty, added)
    val bf = ManifestTable.readBloom(spark, root, added.head)
    assert(bf.nonEmpty, "sidecar did not round-trip")
    // a stored key probes positive (no false negatives)...
    val k3 = spark.range(3, 4).select(md5(col("id").cast("string")))
      .collect()(0).getString(0)
    assert(bf.get.mightContainString(k3))
    // ...and fresh keys probe mostly negative (1% fpp over 200 probes)
    val mdig = java.security.MessageDigest.getInstance("MD5")
    val fresh = (1000 until 1200).map { i =>
      mdig.digest(s"$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
    assert(fresh.count(bf.get.mightContainString) < 20,
      "fresh keys not rejected — filter is not discriminating")

    // a committed file that never got a sidecar reads None, so the prune
    // keeps it (skipping must be provably safe)
    val staging2 = s"$root/_staging/${java.util.UUID.randomUUID()}"
    (100L to 199L).toDF("seq").withColumn("k", md5(col("seq").cast("string")))
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(staging2)
    val added2 = ManifestTable.publishFiles(spark, root, staging2)
    ManifestTable.commitReplace(spark, root, Seq.empty, added2)
    assert(ManifestTable.readBloom(spark, root, added2.head).isEmpty,
      "phantom sidecar for a file that never wrote one")

    // a manifest line with a legacy inline-bloom tail field (the retired
    // format) still yields its path and stats
    val mdir = new org.apache.hadoop.fs.Path(s"$root/_manifests")
    val fs = mdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = ManifestTable.currentVersion(spark, root).get + 1
    val legacy = new org.apache.hadoop.fs.Path(
      s"$root/_manifests/v${"%020d".format(v)}.manifest")
    val out = fs.create(legacy, false)
    try out.write(s"${added.head}\tseq=0..99\tbloom64:AAAA\n".getBytes("UTF-8"))
    finally out.close()
    val back = ManifestTable.liveEntries(spark, root)
    assert(back == Seq(ManifestTable.FileEntry(added.head,
      Map("seq" -> (0L, 99L)))),
      s"legacy tail field broke parsing: $back")
  }
}
