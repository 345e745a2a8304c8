package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.operators.{CorpusStore, ManifestTable}
import graft.operators.CorpusStore.StoreLayout

/** [[CorpusStore.changesBetween]] / [[CorpusStore.readAt]] — the change
  * data feed. The hard claims: the diff equals the row-level difference of
  * the two snapshots' doc views (the naive O(store) reference), rewrite-only
  * windows (compact, rebucket, forget's survivor carry-over) never leak
  * phantom changes, the scan touches ONLY the changed files, and an
  * unretained from-version fails loudly instead of returning a wrong diff.
  */
class StoreChangesSpec extends SparkSpec {

  /** Per-wave salted texts: every shingle of every doc contains a
    * wave-unique token, so waves never near-dup each other or the store —
    * each tick's keeper set is exactly its batch (deterministic commits).
    */
  private def synthDocs(base: Long, n: Int, salt: String): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      (base + i,
        (0 until 30).map(j => s"${salt}tok${i}_$j").mkString(" "),
        "en", "synth", 400L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private def freshStore(retain: Int = 10): String = {
    val root = java.nio.file.Files.createTempDirectory("graft_cdc").toString
    (0 until 2).foreach { i =>
      CorpusStore.tick(synthDocs(i * 1000L, 20, s"w$i"), root,
        tickId = Some(s"w$i"), minQuality = 0.0, retainSnapshots = retain)
    }
    root
  }

  /** The O(store) reference: full readAt row diff keyed on text_md5. */
  private def referenceDiff(root: String, vFrom: Long, vTo: Long)
      : (Set[String], Set[String]) = {
    def md5s(v: Long): Set[String] =
      CorpusStore.readAt(spark, root, v)
        .select("text_md5").collect().map(_.getString(0)).toSet
    val f = md5s(vFrom)
    val t = md5s(vTo)
    (t -- f, f -- t)
  }

  private def changesOf(root: String, vFrom: Long, vTo: Long)
      : (Map[String, String], Seq[String]) = {
    val df = CorpusStore.changesBetween(spark, root, vFrom, vTo)
    val rows = df.collect()
      .map(r => r.getAs[String]("text_md5") -> r.getAs[String]("change"))
    assert(rows.map(_._1).distinct.length === rows.length,
      "a text_md5 appeared in more than one change row")
    (rows.toMap, df.inputFiles.toSeq)
  }

  test("append window: changes are exactly the new tick's keepers, scan " +
    "reads only the changed files") {
    val root = freshStore()
    val vFrom = ManifestTable.currentVersion(spark, root).get
    CorpusStore.tick(synthDocs(9000L, 20, "w2"), root,
      tickId = Some("w2"), minQuality = 0.0, retainSnapshots = 10)
    val vTo = ManifestTable.currentVersion(spark, root).get
    assert(vTo > vFrom)

    val (refIns, refDel) = referenceDiff(root, vFrom, vTo)
    val (changes, scanned) = changesOf(root, vFrom, vTo)
    assert(refDel.isEmpty)
    assert(refIns.size === 20)
    assert(changes.filter(_._2 == "insert").keySet === refIns)
    assert(!changes.valuesIterator.contains("delete"))

    // scan bound: only files the two manifests do NOT share are read
    val shared = ManifestTable.filesOf(spark, root, vFrom).toSet
      .intersect(ManifestTable.filesOf(spark, root, vTo).toSet)
    assert(scanned.nonEmpty)
    scanned.foreach { abs =>
      val rel = abs.substring(abs.lastIndexOf("p_kind="))
      assert(!shared.contains(rel), s"diff read an unchanged file: $rel")
    }
  }

  test("forget window: the purged doc is the one delete; survivors " +
    "carried over by the rewrite cancel") {
    val root = freshStore()
    val vFrom = ManifestTable.currentVersion(spark, root).get
    val victim = CorpusStore.read(spark, root)
      .orderBy("doc_id").limit(1).collect()(0).getAs[String]("text_md5")
    CorpusStore.forget(spark, root, Seq(victim), retainSnapshots = 10)
    val vTo = ManifestTable.currentVersion(spark, root).get
    assert(vTo > vFrom)

    val (changes, _) = changesOf(root, vFrom, vTo)
    assert(changes === Map(victim -> "delete"))
  }

  test("compaction-only and rebucket-only windows yield zero changes") {
    val root = freshStore()
    (2 until 4).foreach { i =>
      CorpusStore.tick(synthDocs(i * 1000L, 20, s"w$i"), root,
        tickId = Some(s"w$i"), minQuality = 0.0, retainSnapshots = 10)
    }
    val v0 = ManifestTable.currentVersion(spark, root).get
    val (rewrittenC, _) =
      CorpusStore.compact(spark, root, targetBytes = 1L << 30)
    val v1 = ManifestTable.currentVersion(spark, root).get
    if (rewrittenC > 0) {
      assert(v1 > v0)
      val (changes, _) = changesOf(root, v0, v1)
      assert(changes.isEmpty, s"compaction leaked phantom changes: $changes")
    }
    // rebucket: EVERY file rewrites; the diff must still cancel to zero.
    // (compact's internal vacuum keeps the default 2 snapshots, so each
    // diff must span only the latest commit — the retention-reach contract
    // the last test pins.)
    CorpusStore.compact(spark, root,
      rebucketTo = Some(StoreLayout(32, 32, 32)))
    val v2 = ManifestTable.currentVersion(spark, root).get
    assert(v2 > v1)
    val (changes2, _) = changesOf(root, v1, v2)
    assert(changes2.isEmpty, s"rebucket leaked phantom changes: $changes2")
  }

  test("same version diffs empty and reads nothing; composition across " +
    "tick + forget matches the reference") {
    val root = freshStore()
    val v = ManifestTable.currentVersion(spark, root).get
    val (same, scanned) = changesOf(root, v, v)
    assert(same.isEmpty)
    assert(scanned.isEmpty, "a no-op diff opened data files")

    CorpusStore.tick(synthDocs(9000L, 20, "w2"), root,
      tickId = Some("w2"), minQuality = 0.0, retainSnapshots = 10)
    val victim = CorpusStore.read(spark, root)
      .orderBy("doc_id").limit(1).collect()(0).getAs[String]("text_md5")
    CorpusStore.forget(spark, root, Seq(victim), retainSnapshots = 10)
    val vTo = ManifestTable.currentVersion(spark, root).get

    val (refIns, refDel) = referenceDiff(root, v, vTo)
    val (changes, _) = changesOf(root, v, vTo)
    assert(changes.filter(_._2 == "insert").keySet === refIns)
    assert(changes.filter(_._2 == "delete").keySet === refDel)
    // changesSince is the same read
    assert(CorpusStore.changesSince(spark, root, v).collect()
      .map(r => r.getAs[String]("text_md5") -> r.getAs[String]("change"))
      .toMap === changes)
  }

  test("an unretained from-version fails loudly; readAt reproduces a " +
    "retained snapshot") {
    // retention 2: after three more commits the build versions are pruned
    val root = freshStore(retain = 2)
    val vOld = ManifestTable.currentVersion(spark, root).get
    val before = CorpusStore.read(spark, root).collect()
      .map(_.toString).sorted.toSeq
    (2 until 5).foreach { i =>
      CorpusStore.tick(synthDocs(i * 1000L, 20, s"w$i"), root,
        tickId = Some(s"w$i"), minQuality = 0.0, retainSnapshots = 2)
    }
    val vNew = ManifestTable.currentVersion(spark, root).get
    // the previous snapshot is retained: readAt reproduces it
    val prev = ManifestTable.versions(spark, root).filter(_ < vNew).max
    assert(CorpusStore.readAt(spark, root, prev).collect().nonEmpty)
    // the old build version's manifest is vacuumed: loud failure, not a
    // silent wrong diff
    assert(!ManifestTable.versions(spark, root).contains(vOld))
    intercept[Exception] {
      CorpusStore.changesBetween(spark, root, vOld, vNew).collect()
    }
    // sanity: the current view still holds the original keepers
    val now = CorpusStore.read(spark, root).collect()
      .map(_.toString).sorted.toSeq
    assert(before.forall(now.contains))
  }

  test("health: manifest-arithmetic counts match the live listing; " +
    "fragmentation climbs with ticks and collapses after compaction") {
    val root = freshStore()
    val h1 = CorpusStore.health(spark, root)
    val live = ManifestTable.liveFiles(spark, root)
    assert(h1.version === ManifestTable.currentVersion(spark, root).get)
    assert(h1.nCommittedTicks === 2)
    h1.kinds.foreach { k =>
      assert(k.nFiles ===
        live.count(_.startsWith(s"p_kind=${k.kind}/")).toLong)
      assert(k.nBuckets <= k.nFiles)
      assert(k.maxFilesPerBucket >= (if (k.nFiles > 0) 1L else 0L))
    }
    // more ticks fragment the touched buckets
    (2 until 6).foreach { i =>
      CorpusStore.tick(synthDocs(i * 1000L, 20, s"w$i"), root,
        tickId = Some(s"w$i"), minQuality = 0.0, retainSnapshots = 10)
    }
    val h2 = CorpusStore.health(spark, root)
    val docMax2 = h2.kinds.find(_.kind == "doc").get.maxFilesPerBucket
    assert(docMax2 > h1.kinds.find(_.kind == "doc").get.maxFilesPerBucket)
    // compaction collapses the fragmentation signal back toward 1
    CorpusStore.compact(spark, root, targetBytes = 1L << 30)
    val h3 = CorpusStore.health(spark, root)
    assert(h3.kinds.find(_.kind == "doc").get.maxFilesPerBucket < docMax2)
    assert(h3.kinds.find(_.kind == "doc").get.maxFilesPerBucket === 1L)
  }
}
