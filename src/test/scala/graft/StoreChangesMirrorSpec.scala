package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col

import graft.operators.{CorpusStore, ManifestTable}
import graft.streaming.StoreChangesMirror

/** The shipped CDF consumer ([[StoreChangesMirror]]): a keyed idempotent
  * upsert that makes the at-least-once stream exactly-once IN EFFECT —
  * crash/replay of any window reproduces the mirror rather than
  * corrupting it, each application is one atomic commit that rewrites
  * only touched md5 buckets, and an aged-out upstream from-version fails
  * the batch loudly instead of silently skipping changes.
  */
class StoreChangesMirrorSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def keyedView(df: DataFrame): Set[String] =
    df.select(col("doc_id"), col("lang"), col("source"), col("text_md5"))
      .collect().map(_.toString).toSet

  test("stream-fed mirror equals the store snapshot through ticks and a " +
    "purge; replaying the last window (at-least-once crash path) is a " +
    "no-op") {
    val docs = Tables.documents(spark, dir)
    val root = java.nio.file.Files.createTempDirectory("graft_mirr_src").toString
    val mirror = java.nio.file.Files.createTempDirectory("graft_mirr_dst").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_mirr_ck").toString
    val n = 4
    def tickWave(i: Int): Unit = {
      CorpusStore.tick(docs.filter(col("doc_id") % n === i), root,
        tickId = Some(s"w$i"), retainSnapshots = 20)
    }
    tickWave(0)
    tickWave(1)
    def startQuery() = StoreChangesMirror.attach(
      spark.readStream
        .format(classOf[graft.streaming.StoreChangesSourceProvider].getName)
        .option("root", root)
        .option("fromVersion", "0")
        .load(),
      mirror)
      .option("checkpointLocation", ckpt)
      .start()
    val q = startQuery()
    try {
      q.processAllAvailable()
      assert(keyedView(StoreChangesMirror.read(spark, mirror)) ==
        keyedView(CorpusStore.read(spark, root)),
        "mirror diverged from the store snapshot after bootstrap")

      tickWave(2)
      val victimMd5 = CorpusStore.read(spark, root).collect()
        .minBy(_.getAs[Long]("doc_id")).getAs[String]("text_md5")
      CorpusStore.forget(spark, root, Seq(victimMd5), retainSnapshots = 20)
      q.processAllAvailable()
      val afterPurge = keyedView(CorpusStore.read(spark, root))
      assert(keyedView(StoreChangesMirror.read(spark, mirror)) == afterPurge,
        "mirror diverged after tick + purge")
      assert(!StoreChangesMirror.read(spark, mirror).collect()
        .exists(_.getAs[String]("text_md5") == victimMd5),
        "purged document still present in the mirror")

      // the at-least-once crash path: the engine re-runs the last
      // uncommitted window after a restart — applying that window again
      // (twice, even) must reproduce the same mirror byte-for-byte
      val cur = ManifestTable.currentVersion(spark, root).get
      val lastWindow = CorpusStore.changesBetween(spark, root, cur - 1, cur)
      StoreChangesMirror.applyBatch(lastWindow, mirror)
      StoreChangesMirror.applyBatch(lastWindow, mirror)
      assert(keyedView(StoreChangesMirror.read(spark, mirror)) == afterPurge,
        "replaying a delivered window corrupted the mirror — the upsert " +
          "is not idempotent")
    } finally q.stop()
  }

  test("a batch rewrites only the md5 buckets its keys touch — one atomic " +
    "commit, O(touched buckets) not O(mirror)") {
    val docs = Tables.documents(spark, dir)
    val root = java.nio.file.Files.createTempDirectory("graft_mirr_b_src").toString
    val mirror = java.nio.file.Files.createTempDirectory("graft_mirr_b_dst").toString
    CorpusStore.tick(docs, root, tickId = Some("t0"), retainSnapshots = 20)
    StoreChangesMirror.applyBatch(
      CorpusStore.changesBetween(spark, root, 0L, 1L), mirror)
    val v1 = ManifestTable.currentVersion(spark, mirror).get
    val before = ManifestTable.filesOf(spark, mirror, v1).toSet
    // a one-key window: delete a single document
    val victimMd5 = CorpusStore.read(spark, root).collect()
      .minBy(_.getAs[Long]("doc_id")).getAs[String]("text_md5")
    CorpusStore.forget(spark, root, Seq(victimMd5), retainSnapshots = 20)
    StoreChangesMirror.applyBatch(
      CorpusStore.changesSince(spark, root, 1L), mirror)
    val v2 = ManifestTable.currentVersion(spark, mirror).get
    assert(v2 == v1 + 1, "the apply was not one atomic commit")
    val after = ManifestTable.filesOf(spark, mirror, v2).toSet
    val changedDirs = ((before diff after) ++ (after diff before))
      .map(_.split("/").head)
    assert(changedDirs.size == 1,
      s"a one-key window rewrote ${changedDirs.size} buckets: $changedDirs")
    // untouched buckets' files carried forward byte-identical (same paths)
    assert((before diff after).forall(_.startsWith(changedDirs.head + "/")),
      "files outside the touched bucket were rewritten")
  }

  test("an aged-out from-version fails the batch loudly, never a silent " +
    "skip") {
    val docs = Tables.documents(spark, dir)
    val root = java.nio.file.Files.createTempDirectory("graft_mirr_ret").toString
    val n = 4
    (0 until n).foreach { i =>
      CorpusStore.tick(docs.filter(col("doc_id") % n === i), root,
        tickId = Some(s"w$i"), retainSnapshots = 2)
    }
    // retention 2 on 4 commits: version 1's manifest is vacuumed
    val versions = ManifestTable.versions(spark, root)
    assert(!versions.contains(1L),
      s"retention did not expire v1 (versions: $versions) — the test " +
        "cannot exercise the aged-out path")
    val e = intercept[Exception] {
      CorpusStore.changesBetween(spark, root, 1L, versions.max).count()
    }
    assert(e.getMessage != null, s"unexpected failure shape: $e")
  }
}
