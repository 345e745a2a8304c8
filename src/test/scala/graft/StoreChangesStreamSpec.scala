package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col

import graft.operators.{CorpusStore, ManifestTable}

/** The corpus store's change data feed as a Structured Streaming source
  * ([[graft.streaming.StoreChangesSource]]): offsets are committed store
  * versions, every micro-batch is exactly `changesBetween(from, to)`, the
  * bootstrap (`fromVersion=0`) is a full export, admission control bounds
  * windows to one version, and a restart resumes from the checkpoint
  * without re-delivering committed windows.
  */
class StoreChangesStreamSpec extends SparkSpec {

  private def rowsOf(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("CDF stream: bootstrap export, per-version windows, tick+purge " +
    "follow-up, checkpoint resume") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
    val root = java.nio.file.Files.createTempDirectory("graft_cdfs").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cdfs_ck").toString
    val n = 4
    def tickWave(i: Int): Unit = {
      CorpusStore.tick(docs.filter(col("doc_id") % n === i), root,
        tickId = Some(s"w$i"), retainSnapshots = 20)
    }
    tickWave(0)
    tickWave(1)

    val batches =
      new java.util.concurrent.ConcurrentHashMap[Long, Array[Row]]()
    def startQuery() = spark.readStream
      .format(classOf[graft.streaming.StoreChangesSourceProvider].getName)
      .option("root", root)
      .option("fromVersion", "0")
      .option("maxVersionsPerTrigger", "1")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch((df: org.apache.spark.sql.Dataset[Row], id: Long) => {
        batches.put(id, df.collect()); ()
      })
      .start()

    val q = startQuery()
    try {
      q.processAllAvailable()
      // bootstrap at one version per trigger: batch 0 = (0→1), 1 = (1→2)
      assert(batches.size == 2,
        s"expected 2 bootstrap windows, got ${batches.keySet()}")
      Seq((0L, 0L, 1L), (1L, 1L, 2L)).foreach { case (id, from, to) =>
        assert(batches.get(id).map(_.toString).sorted.toSeq ==
          rowsOf(CorpusStore.changesBetween(spark, root, from, to)),
          s"batch $id diverged from changesBetween($from, $to)")
      }
      assert(batches.get(0L).forall(_.getAs[String]("change") == "insert"),
        "bootstrap window carried non-insert changes")

      // live follow: one tick, one purge — each its own window
      tickWave(2)
      // a KEPT document's md5 (a never-kept text would purge to a bare
      // tombstone — no doc-kind change, so no CDF delete row)
      val victimMd5 = CorpusStore.read(spark, root).collect()
        .minBy(_.getAs[Long]("doc_id")).getAs[String]("text_md5")
      CorpusStore.forget(spark, root, Seq(victimMd5), retainSnapshots = 20)
      assert(ManifestTable.currentVersion(spark, root).contains(4L))
      q.processAllAvailable()
      assert(batches.size == 4, s"expected 4 windows, got ${batches.keySet()}")
      assert(batches.get(2L).map(_.toString).sorted.toSeq ==
        rowsOf(CorpusStore.changesBetween(spark, root, 2L, 3L)))
      val purgeWindow = batches.get(3L)
      assert(purgeWindow.map(_.toString).sorted.toSeq ==
        rowsOf(CorpusStore.changesBetween(spark, root, 3L, 4L)))
      assert(purgeWindow.exists(r => r.getAs[String]("change") == "delete" &&
        r.getAs[String]("text_md5") == victimMd5),
        "purge window missed the victim's delete")
    } finally q.stop()

    // restart from the checkpoint: only the NEW window arrives
    tickWave(3)
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      assert(batches.size == 5,
        s"restart re-delivered or skipped windows: ${batches.keySet()}")
      assert(batches.get(4L).map(_.toString).sorted.toSeq ==
        rowsOf(CorpusStore.changesBetween(spark, root, 4L, 5L)),
        "post-restart window diverged from changesBetween(4, 5)")
    } finally q2.stop()
  }

  test("changesBetween from version 0 is the bootstrap full export") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
    val root = java.nio.file.Files.createTempDirectory("graft_cdfb").toString
    CorpusStore.tick(docs.filter(col("doc_id") % 5 === 0), root,
      tickId = Some("b0"))
    val diff = CorpusStore.changesBetween(spark, root, 0L,
      ManifestTable.currentVersion(spark, root).get).collect()
    assert(diff.nonEmpty && diff.forall(_.getAs[String]("change") == "insert"))
    assert(diff.map(_.getAs[Long]("doc_id")).sorted.toSeq ==
      CorpusStore.read(spark, root).collect()
        .map(_.getAs[Long]("doc_id")).sorted.toSeq,
      "bootstrap diff is not the full kept-document set")
  }

  test("the internalCreateDataFrame seam resolves at source construction " +
    "and fails LOUDLY and actionably on a Spark that moved it") {
    // the real session class carries the seam (what construction resolves)
    val m = graft.streaming.StoreChangesSource
      .resolveInternalCreate(spark.getClass)
    assert(m.getName == "internalCreateDataFrame")
    // a class without it — the shape of a Spark upgrade that renamed or
    // re-signatured the private[sql] constructor — must fail with the
    // actionable message, not a bare NoSuchMethodException mid-stream
    val e = intercept[IllegalStateException] {
      graft.streaming.StoreChangesSource
        .resolveInternalCreate(classOf[java.lang.Object])
    }
    assert(e.getMessage.contains("internalCreateDataFrame") &&
      e.getMessage.contains("StoreChangesSource"),
      s"failure message is not actionable: ${e.getMessage}")
    assert(e.getCause.isInstanceOf[NoSuchMethodException])
  }
}
