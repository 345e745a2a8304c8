package graft

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

import graft.operators.{CorpusStore, ManifestTable}
import graft.operators.CorpusStore.StoreLayout

/** The store's physical-layout machinery: the rebucket migration, the
  * incremental (fragmented-buckets-only) compaction, and the fail-loud
  * paths of the `_layout` sidecar. These are the proofs behind the
  * layout-evolution story: a live store's bucket counts can be raised
  * atomically without changing a row of content or a bit of dedup state,
  * and every way a reader and writer could disagree about the layout is
  * an error, never a silent dedup miss.
  *
  * Reference analog: the writer/reader schema agreement the reference
  * gets from Postgres DDL for free (`/root/reference/src/pipeline/db.py:15-51`);
  * on files the store must carry that agreement itself.
  */
class CorpusStoreLayoutSpec extends SparkSpec {

  private def sameRows(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  /** All live rows of one kind, WITH the p_b partition column recovered. */
  private def kindRows(root: String, kind: String): Option[DataFrame] = {
    val dd = ManifestTable.dataDir(root)
    val files = CorpusStore.kindFiles(spark, root, kind)
    if (files.isEmpty) None
    else Some(spark.read.option("basePath", dd)
      .parquet(files.map(f => s"$dd/$f"): _*))
  }

  private val KindCols = Map(
    "doc" -> Seq("doc_id", "lang", "source", "text", "text_md5", "tick"),
    "sh" -> Seq("doc_id", "shingles"),
    "band" -> Seq("doc_id", "band_id", "band_val"),
    "tomb" -> Seq("text_md5"))

  /** The kind's bucket expression under `l` — the read-side mirror of the
    * write-side `p_b` derivation in tick/compact.
    */
  private def bucketExpr(kind: String, l: StoreLayout) = kind match {
    case "doc" | "tomb" => CorpusStore.md5Bucket(col("text_md5"), l)
    case "band" => CorpusStore.bandBucket(col("band_id"), col("band_val"), l)
    case "sh"   => CorpusStore.shingleBucket(col("doc_id"), l)
  }

  test("rebucket migration: rows, dedup state, and replay survive; dirs " +
    "agree with the new layout; old-layout assertions throw") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val layoutA = StoreLayout(8, 8, 8)
    val layoutB = StoreLayout(32, 32, 32)
    val root = java.nio.file.Files.createTempDirectory("graft_rebucket").toString
    val twin = java.nio.file.Files.createTempDirectory("graft_rebucket_twin").toString
    try {
      val n = 3
      (0 until n).foreach { i =>
        val slice = docs.filter(col("doc_id") % n === i)
        Seq(root, twin).foreach { r =>
          CorpusStore.tick(slice, r, tickId = Some(s"w$i"),
            layoutIfNew = Some(layoutA))
        }
      }
      assert(CorpusStore.layoutOf(spark, root) == layoutA,
        "creation layout did not persist")

      // the migration: one atomic commit recomputes every p_b and flips
      // the sidecar at the same version
      val vBefore = ManifestTable.currentVersion(spark, root).get
      CorpusStore.compact(spark, root, rebucketTo = Some(layoutB))
      assert(CorpusStore.layoutOf(spark, root) == layoutB,
        "rebucket did not flip the layout sidecar")
      assert(ManifestTable.currentVersion(spark, root).contains(vBefore + 1))

      // (a) every kind's ROWS are byte-stable vs the never-rebucketed twin,
      // and every live file sits in the dir its rows hash to under the NEW
      // layout (the dir-name <-> expression agreement the prune relies on)
      KindCols.foreach { case (kind, cols) =>
        (kindRows(root, kind), kindRows(twin, kind)) match {
          case (Some(a), Some(b)) =>
            assert(sameRows(a.select(cols.map(col): _*),
              b.select(cols.map(col): _*)),
              s"$kind rows changed across the rebucket")
            assert(a.filter(bucketExpr(kind, layoutB) =!=
              col("p_b").cast("int")).isEmpty,
              s"$kind files landed in dirs foreign to the new layout")
          case (None, None) => // kind empty in both stores: consistent
          case _ => fail(s"$kind kind present in only one twin store")
        }
      }

      // (b) the NEXT tick's dedup decisions are identical to the twin's —
      // the state the rebucket carried is not just present but CORRECT
      // under the new pruned scans
      // fresh ids; texts = a store doc's text plus a suffix → a mix of
      // near-dup drops (exercising the pruned band/shingle reads under
      // layoutB) and genuine keepers
      val wave3 = docs.filter(col("doc_id") % n === 1)
        .withColumn("doc_id", col("doc_id") + 100000L)
        .withColumn("text", org.apache.spark.sql.functions.concat(
          col("text"), org.apache.spark.sql.functions.lit(" graft suffix")))
      val r1 = CorpusStore.tick(wave3, root, tickId = Some("w3"))
      val r2 = CorpusStore.tick(wave3, twin, tickId = Some("w3"))
      assert(r1.nKept == r2.nKept && r1.nExactNew == r2.nExactNew,
        s"post-rebucket tick diverged from the twin: $r1 vs $r2")
      assert(sameRows(CorpusStore.docs(spark, root),
        CorpusStore.docs(spark, twin)),
        "post-rebucket keeper set diverged from the twin")

      // (c) replay against the migrated store: the marker fast path and
      // the semantic no-op both survive the rebucket
      val vNow = ManifestTable.currentVersion(spark, root).get
      assert(CorpusStore.tick(docs.filter(col("doc_id") % n === 0), root,
        tickId = Some("w0")).replaySkipped)
      val sem = CorpusStore.tick(docs.filter(col("doc_id") % n === 0), root)
      assert(!sem.replaySkipped && sem.nKept == 0L
        && ManifestTable.currentVersion(spark, root).contains(vNow),
        s"semantic replay against the rebucketed store was not a no-op: $sem")

      // (d) asserting the RETIRED layout is now a configuration error
      val ex = intercept[IllegalArgumentException] {
        CorpusStore.tick(wave3, root, layoutIfNew = Some(layoutA))
      }
      assert(ex.getMessage.contains("compact(rebucketTo"),
        s"wrong error for a retired-layout assertion: ${ex.getMessage}")
    } finally spark.catalog.clearCache()
  }

  test("incremental compaction rewrites ONLY fragmented buckets; cold " +
    "buckets' files are carried untouched") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val root = java.nio.file.Files.createTempDirectory("graft_inccompact").toString
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dd = ManifestTable.dataDir(root)
    try {
      // wave 0 populates most buckets once; waves 1-2 are tiny batches
      // confined to ONE md5 bucket (chosen from the data), so exactly the
      // buckets they touch accumulate extra files and everything else
      // stays cold. threshold≈1 keeps the near-dup gate out of the way —
      // this spec is about files, not dedup decisions.
      def tick(batch: DataFrame, id: String) =
        CorpusStore.tick(batch, root, tickId = Some(id), minQuality = 0.0,
          threshold = 0.999)
      tick(docs.filter(col("doc_id") % 3 === 0), "w0")
      val lay = CorpusStore.layoutOf(spark, root)
      val rest = docs.filter(col("doc_id") % 3 =!= 0)
        .withColumn("__b", CorpusStore.md5Bucket(
          org.apache.spark.sql.functions.md5(col("text")), lay))
      val tb = rest.groupBy("__b")
        .count().orderBy(col("count").desc, col("__b"))
        .limit(1).collect()(0).getInt(0)
      val hot = rest.filter(col("__b") === tb).drop("__b")
        .orderBy("doc_id").limit(6).persist()
      assert(hot.count() >= 2, "need at least 2 docs in the chosen bucket")
      tick(hot.filter(col("doc_id") % 2 === 0), "w1")
      tick(hot.filter(col("doc_id") % 2 === 1), "w2")

      def filesByDir(): Map[String, Seq[(String, Long)]] =
        ManifestTable.liveFiles(spark, root)
          .map(f => f -> fs.getFileStatus(
            new org.apache.hadoop.fs.Path(s"$dd/$f")).getLen)
          .groupBy(_._1.split('/').take(2).mkString("/"))
      val before = filesByDir()
      val target = 1L << 30 // every bucket justifies exactly one file
      val fragmented = before.filter(_._2.length > 1).keySet
      val cold = before.keySet -- fragmented
      assert(fragmented.nonEmpty, "construction failed: nothing fragmented")
      assert(cold.nonEmpty, "construction failed: no cold buckets")
      assert(fragmented.exists(d => d.startsWith("p_kind=doc/") ||
        d.startsWith("p_kind=tomb/")),
        s"expected the hot md5 bucket to fragment, got $fragmented")
      val rowsBefore = KindCols.map { case (kind, cols) =>
        kind -> kindRows(root, kind).map(_.select(cols.map(col): _*)
          .collect().toSeq.sortBy(_.toString))
      }

      val (nb, na) = CorpusStore.compact(spark, root, targetBytes = target)
      assert(nb == before.values.map(_.length).sum.toLong)
      assert(na < nb, s"compaction did not shrink the file count: $nb -> $na")

      val after = filesByDir()
      // cold dirs: the EXACT same file paths, not rewritten equivalents —
      // one invocation costs O(fragmented buckets), not O(store)
      cold.foreach { dir =>
        assert(after(dir).map(_._1).sorted == before(dir).map(_._1).sorted,
          s"cold bucket $dir was rewritten by an incremental compact")
      }
      // fragmented dirs: merged down to what their bytes justify (1 file
      // here), with every old file replaced
      fragmented.foreach { dir =>
        assert(after(dir).length == 1,
          s"fragmented bucket $dir not merged: ${after(dir).map(_._1)}")
        assert(!before(dir).map(_._1).toSet.exists(after(dir).map(_._1).toSet),
          s"fragmented bucket $dir kept a pre-compact file")
      }
      // rows byte-stable per kind, layout untouched, replay still a no-op
      KindCols.foreach { case (kind, cols) =>
        val now = kindRows(root, kind).map(_.select(cols.map(col): _*)
          .collect().toSeq.sortBy(_.toString))
        assert(now == rowsBefore(kind), s"$kind rows changed across compact")
      }
      assert(CorpusStore.layoutOf(spark, root) == lay)
      val v = ManifestTable.currentVersion(spark, root)
      val rep = CorpusStore.tick(hot, root, minQuality = 0.0,
        threshold = 0.999)
      assert(rep.nKept == 0L && ManifestTable.currentVersion(spark, root) == v,
        s"replay against the compacted store was not a no-op: $rep")

      // idempotence: a second compact at the same target finds nothing
      // fragmented and commits nothing
      val vAfter = ManifestTable.currentVersion(spark, root)
      val (nb2, na2) = CorpusStore.compact(spark, root, targetBytes = target)
      assert(nb2 == na2 && ManifestTable.currentVersion(spark, root) == vAfter,
        "re-compacting an already-compact store was not a no-op")
      hot.unpersist()
    } finally spark.catalog.clearCache()
  }

  test("layout sidecar fail-loud: foreign expression version throws at " +
    "open; a foreign-format root refuses to read; the legacy fallback is " +
    "pinned to 16/16/16") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val root = java.nio.file.Files.createTempDirectory("graft_laybad").toString
    try {
      CorpusStore.tick(docs.filter(col("doc_id") % 7 === 0), root,
        tickId = Some("w0"))
      val v = ManifestTable.currentVersion(spark, root).get

      // foreign expression version: reading it would file-prune against
      // wrong directories, so open throws with the migration instruction.
      // The AUTHORITATIVE channel is the commit's own #meta:layout line
      // (atomic with the snapshot), so that is what gets tampered first.
      // Rewrite through the hadoop FS (keeps the local-FS crc sidecar in
      // step — a raw java.nio edit would fail the checksum, not the parse)
      val hfs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      def rewrite(p: org.apache.hadoop.fs.Path)(f: String => String): Unit = {
        val in = hfs.open(p)
        val orig = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        val out = hfs.create(p, true)
        try out.write(f(orig).getBytes("UTF-8")) finally out.close()
      }
      val manifest = new org.apache.hadoop.fs.Path(
        s"$root/_manifests/v${"%020d".format(v)}.manifest")
      rewrite(manifest)(
        _.replace("\"exprVersion\":1", "\"exprVersion\":2"))
      val ex = intercept[IllegalStateException] {
        CorpusStore.layoutOf(spark, root)
      }
      assert(ex.getMessage.contains("bucket-expression version")
        && ex.getMessage.contains("rebucket"), ex.getMessage)

      // PRE-META store (the legacy form): strip the meta line entirely —
      // resolution falls back to the `_layout/v{N}` sidecar, whose foreign
      // expression version must throw the same way
      rewrite(manifest)(_.split("\n")
        .filterNot(_.startsWith("#meta:")).mkString("\n") + "\n")
      val sidecar = new org.apache.hadoop.fs.Path(s"$root/_layout/v$v")
      rewrite(sidecar)(
        _.replace("\"exprVersion\":1", "\"exprVersion\":2"))
      val ex1b = intercept[IllegalStateException] {
        CorpusStore.layoutOf(spark, root)
      }
      assert(ex1b.getMessage.contains("bucket-expression version"),
        ex1b.getMessage)

      // missing sidecar on a pre-meta store = a pre-sidecar store,
      // necessarily written at the then-constant 16/16/16. PINNED: if
      // DefaultLayout ever changes, this assertion is the tripwire that
      // the legacy fallback would silently corrupt old stores.
      hfs.delete(new org.apache.hadoop.fs.Path(s"$root/_layout"), true)
      assert(CorpusStore.DefaultLayout == StoreLayout(16, 16, 16),
        "DefaultLayout changed: pre-sidecar stores were written at " +
          "16/16/16 and the legacy fallback would now mis-prune them — " +
          "gate the new default behind a sidecar-only path first")
      assert(CorpusStore.layoutOf(spark, root) == StoreLayout(16, 16, 16))

      // a root whose live files carry no p_kind= prefix is NOT a corpus
      // store: reading it as an empty one would re-ingest everything
      import spark.implicits._
      val foreign = java.nio.file.Files.createTempDirectory("graft_layfor").toString
      val staging = s"$foreign/_staging/${java.util.UUID.randomUUID()}"
      (0L to 9L).toDF("seq").coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(staging)
      ManifestTable.commitReplace(spark, foreign, Seq.empty,
        ManifestTable.publishFiles(spark, foreign, staging))
      val ex2 = intercept[IllegalArgumentException] {
        CorpusStore.read(spark, foreign)
      }
      assert(ex2.getMessage.contains("p_kind="), ex2.getMessage)
    } finally spark.catalog.clearCache()
  }

  test("caller-supplied layouts must carry this binary's expression " +
    "version — a mislabeled sidecar must never persist") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val bad = StoreLayout(8, 8, 8, exprVersion = 2)
    val root = java.nio.file.Files.createTempDirectory("graft_layver").toString
    try {
      // at creation: the tick must throw BEFORE any commit
      intercept[IllegalArgumentException] {
        CorpusStore.tick(docs.filter(col("doc_id") % 7 === 0), root,
          layoutIfNew = Some(bad))
      }
      assert(ManifestTable.currentVersion(spark, root).isEmpty,
        "a rejected layout still committed a snapshot")
      // at migration: compact(rebucketTo) guards the same way
      CorpusStore.tick(docs.filter(col("doc_id") % 7 === 0), root,
        tickId = Some("w0"))
      intercept[IllegalArgumentException] {
        CorpusStore.compact(spark, root, rebucketTo = Some(bad))
      }
      assert(CorpusStore.layoutOf(spark, root) == CorpusStore.DefaultLayout)
    } finally spark.catalog.clearCache()
  }

  test("a creation layout chosen by a zero-commit tick is not lost") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val chosen = StoreLayout(4, 4, 4)
    val root = java.nio.file.Files.createTempDirectory("graft_layzero").toString
    try {
      // every document fails the quality gate: the tick processes, drops
      // all, and commits NOTHING — but its explicit layout choice must
      // survive as the staged v1 sidecar
      val r0 = CorpusStore.tick(docs.filter(col("doc_id") % 7 === 0), root,
        tickId = Some("w0"), minQuality = 1e9, layoutIfNew = Some(chosen))
      assert(r0.nKept == 0L
        && ManifestTable.currentVersion(spark, root).isEmpty,
        s"construction failed: the creation tick committed: $r0")
      assert(CorpusStore.layoutOf(spark, root) == chosen,
        "zero-commit creation choice not visible to layoutOf")

      // the store's ACTUAL creation, with no layout argument at all,
      // adopts the staged choice — not DefaultLayout
      CorpusStore.tick(docs.filter(col("doc_id") % 7 === 1), root,
        tickId = Some("w1"))
      assert(ManifestTable.currentVersion(spark, root).contains(1L))
      assert(CorpusStore.layoutOf(spark, root) == chosen,
        "creation without layoutIfNew discarded the staged choice")
      // and the files really sit in dirs of the chosen layout
      KindCols.foreach { case (kind, _) =>
        kindRows(root, kind).foreach { rows =>
          assert(rows.filter(bucketExpr(kind, chosen) =!=
            col("p_b").cast("int")).isEmpty,
            s"$kind files landed in dirs foreign to the staged layout")
        }
      }
      // asserting a different layout on the now-existing store throws
      intercept[IllegalArgumentException] {
        CorpusStore.tick(docs.filter(col("doc_id") % 7 === 2), root,
          layoutIfNew = Some(StoreLayout(8, 8, 8)))
      }
    } finally spark.catalog.clearCache()
  }

  test("marker housekeeping's clock probe never appears as a tick id") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val root = java.nio.file.Files.createTempDirectory("graft_layclk").toString
    try {
      CorpusStore.tick(docs.filter(col("doc_id") % 7 === 0), root,
        tickId = Some("w0"))
      // a prune that expires nothing still writes+deletes its probe; the
      // probe lives in _clock/, so the tick listing is exactly the ticks
      val deleted = CorpusStore.pruneTickMarkers(spark, root,
        olderThanMillis = 365L * 24 * 3600 * 1000)
      assert(deleted == 0L)
      assert(CorpusStore.committedTicks(spark, root) == Seq("w0"))
      // each prune deletes ITS OWN probe file (never the whole _clock/
      // dir — that would race a concurrent pruner's live probe), so the
      // namespace may remain but must hold no files
      val clk = new java.io.File(s"$root/_clock")
      assert(!clk.exists || clk.listFiles.isEmpty,
        "clock-probe file left behind")
    } finally spark.catalog.clearCache()
  }

  test("a raced-away current-version layout sidecar walks back to the " +
    "previous version's identical layout, never to the default") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val lay = StoreLayout(32, 32, 32)
    val root = java.nio.file.Files.createTempDirectory("graft_laywb").toString
    try {
      CorpusStore.tick(docs.filter(col("doc_id") % 7 === 0), root,
        tickId = Some("w0"), minQuality = 0.0, layoutIfNew = Some(lay))
      CorpusStore.tick(docs.filter(col("doc_id") % 7 === 1), root,
        tickId = Some("w1"), minQuality = 0.0)
      val v = ManifestTable.currentVersion(spark, root).get
      assert(v >= 2, s"expected two commits, got $v")
      // the race: concurrent version-dir pruning deleted the sidecar the
      // current version just wrote. Layouts change only at compact time,
      // so the previous retained version's sidecar is identical — the
      // resolution must walk back to it, not silently revert to the
      // 16-bucket default (= wrong dirs = missed duplicates)
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fs.delete(new org.apache.hadoop.fs.Path(s"$root/_layout/v$v"),
        false), "current-version sidecar unexpectedly absent")
      assert(CorpusStore.layoutOf(spark, root) == lay,
        "layout silently reverted to the default after a raced sidecar")
      // the store still functions under the walked-back layout: a
      // semantic replay of an ingested wave commits nothing
      val rep = CorpusStore.tick(docs.filter(col("doc_id") % 7 === 1), root,
        minQuality = 0.0)
      assert(rep.nKept == 0L,
        s"replay under the walked-back layout was not a no-op: $rep")
    } finally spark.catalog.clearCache()
  }

  test("production-bucket-count migration: 16 -> 512 rebucket keeps the " +
    "layout math honest at the counts a 100 TB store would run") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val big = StoreLayout(512, 512, 512)
    val root = java.nio.file.Files.createTempDirectory("graft_rb512").toString
    try {
      val n = 3
      (0 until n).foreach { i =>
        CorpusStore.tick(docs.filter(col("doc_id") % n === i), root,
          tickId = Some(s"w$i"))  // DefaultLayout = 16/16/16
      }
      val docsBefore = CorpusStore.docs(spark, root).count()
      val t0 = System.nanoTime()
      CorpusStore.compact(spark, root, rebucketTo = Some(big))
      val migrateSec = (System.nanoTime() - t0) / 1e9
      info(f"16->512 rebucket at sf0.001: $migrateSec%.1f s, " +
        s"${ManifestTable.liveFiles(spark, root).size} live files")
      assert(CorpusStore.layoutOf(spark, root) == big)
      assert(CorpusStore.docs(spark, root).count() == docsBefore,
        "rebucket changed the keeper count")

      // file counts: every live file sits under a p_b within the new
      // bucket range, and the dir its rows hash to matches the expression
      // (the dir-name <-> expression agreement the prune relies on)
      val live = ManifestTable.liveFiles(spark, root)
      val pb = "p_b=(\\d+)/".r
      // the band kind's p_b space is (band_id, band_val-bucket) flattened:
      // NumBands x 512; every other kind is the raw 512
      def pbCap(f: String): Int =
        if (f.startsWith("p_kind=band/")) graft.operators.Dedup.NumBands * 512
        else 512
      assert(live.forall(f => pb.findFirstMatchIn(f)
        .exists(_.group(1).toInt < pbCap(f))),
        "a live file sits outside its kind's 512-layout bucket range")
      KindCols.foreach { case (kind, _) =>
        kindRows(root, kind).foreach { rows =>
          assert(rows.filter(bucketExpr(kind, big) =!=
            col("p_b").cast("int")).isEmpty,
            s"$kind files landed in dirs foreign to the 512 layout")
        }
      }
      // sidecar coverage: every probed-kind live file kept a bloom
      Seq("doc", "band", "sh").foreach { kind =>
        val of = live.filter(_.startsWith(s"p_kind=$kind/"))
        assert(of.nonEmpty && of.forall(f =>
          ManifestTable.readBloom(spark, root, f).nonEmpty),
          s"$kind lost bloom sidecars through the 512 rebucket")
      }

      // a post-migration batch's pruned scan stays within ITS touched
      // buckets — the O(touched) bound, now at production bucket counts
      // where touched is a small fraction of 512
      val batch = docs.filter(col("doc_id") % 17 === 0)
        .limit(20).select(org.apache.spark.sql.functions
          .md5(col("text")).as("k"))
      val keysByBucket = batch
        .select(col("k"), CorpusStore.md5Bucket(col("k"), big).as("b"))
        .distinct().collect()
        .groupBy(_.getInt(1))
        .map { case (b, rs) => b -> rs.toSeq.map(_.getString(0)) }
      val touched = keysByBucket.keySet
      assert(touched.size < 64,
        s"probe batch unexpectedly touched ${touched.size} of 512 buckets")
      val pruned = CorpusStore.bloomPrunedKindFiles(spark, root, "doc",
        keysByBucket)
      assert(pruned.forall(f => pb.findFirstMatchIn(f)
        .exists(m => touched.contains(m.group(1).toInt))),
        "pruned scan escaped the batch's touched buckets")
      val allDocFiles = live.count(_.startsWith("p_kind=doc/"))
      assert(pruned.size < allDocFiles,
        s"prune read all $allDocFiles doc files — no skipping at 512")

      // dedup state is still CORRECT through 512-bucket pruned reads: a
      // semantic replay of an ingested wave commits nothing
      val v = ManifestTable.currentVersion(spark, root)
      val rep = CorpusStore.tick(docs.filter(col("doc_id") % n === 1), root)
      assert(rep.nKept == 0L &&
        ManifestTable.currentVersion(spark, root) == v,
        s"replay through the 512-bucket store was not a no-op: $rep")
    } finally spark.catalog.clearCache()
  }
}
