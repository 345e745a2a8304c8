package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.{CorpusStore, ManifestTable}
import graft.streaming.StreamingCorpus

class StreamingCorpusSpec extends SparkSpec {
  import spark.implicits._

  // ≥0.7 quality: letters-only words, ~25% stopwords, 60 tokens
  private def goodText(seed: String, n: Int = 60): String =
    (1 to n).map { i =>
      if (i % 4 == 0) "the"
      else seed + "w" +
        "abcdefghijklmnopqrstuvwxyz"((i * 7) % 26).toString * (i % 3 + 2)
    }.mkString(" ")

  test("streaming corpus build: junk batch no-op, dedup vs store, replay skip") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_scorpus").toString
    val docCols = Seq("doc_id", "lang", "source", "text")
    def doc(id: Long, t: String) = (id, "en", "web", t)

    val mem = MemoryStream[(Long, String, String, String)]
    val q = mem.toDF().toDF(docCols: _*)
      .writeStream.foreachBatch(StreamingCorpus.foreachBatchIngest(root, "lineage1") _)
      .start()
    try {
      // batch 0: junk below the quality gate — a recorded no-op, not a
      // stream failure; no snapshot exists yet
      mem.addData(doc(1L, "7 8 9"))
      q.processAllAvailable()
      assert(ManifestTable.currentVersion(spark, root).isEmpty,
        "junk batch minted a snapshot")
      assert(CorpusStore.committedTicks(spark, root) == Seq("lineage1-0"),
        "junk batch left no tick marker")

      // batch 1: a good doc and its exact copy — first arrival wins
      mem.addData(doc(10L, goodText("alpha")), doc(11L, goodText("alpha")))
      q.processAllAvailable()
      // batch 2: near-dup of doc 10 (one word changed, jaccard >> 0.5)
      // dropped vs the store; a novel doc kept
      val nearDup = goodText("alpha").split(" ").zipWithIndex
        .map { case (w, i) => if (i == 30) "changed" else w }.mkString(" ")
      mem.addData(doc(20L, nearDup), doc(21L, goodText("omega")))
      q.processAllAvailable()

      val kept = CorpusStore.docs(spark, root)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(kept == Seq(10L, 21L), s"kept $kept")
    } finally q.stop()

    // at-least-once replay of batch 1: the tick marker skips it outright
    val vBefore = ManifestTable.currentVersion(spark, root)
    StreamingCorpus.foreachBatchIngest(root, "lineage1")(
      Seq(doc(10L, goodText("alpha")), doc(11L, goodText("alpha")))
        .toDF(docCols: _*), 1L)
    assert(ManifestTable.currentVersion(spark, root) == vBefore,
      "replayed batch advanced the store version")
    spark.catalog.clearCache()
  }

  test("streaming platform tick: embeddings ride the document rows into the index") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_spidx").toString
    val ivf = java.nio.file.Files.createTempDirectory("graft_spidx_ivf").toString
    val cols = Seq("doc_id", "lang", "source", "text", "embedding")
    def doc(id: Long, t: String, v: Seq[Float]) = (id, "en", "web", t, v)

    val mem = MemoryStream[(Long, String, String, String, Seq[Float])]
    val q = mem.toDF().toDF(cols: _*)
      .writeStream
      .foreachBatch(StreamingCorpus.foreachBatchIngestWithIndex(root, ivf, "lineage1") _)
      .start()
    try {
      mem.addData(
        doc(1L, goodText("alpha"), Seq(1f, 0f)),
        doc(2L, goodText("beta"), Seq(0f, 1f)))
      q.processAllAvailable()
      mem.addData(
        doc(3L, goodText("alpha"), Seq(0.9f, 0.1f)), // exact-dup text: dropped
        doc(4L, goodText("gamma"), Seq(0.2f, 0.9f)))
      q.processAllAvailable()
      val kept = CorpusStore.docs(spark, root)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(kept == Seq(1L, 2L, 4L), s"kept $kept")
      val posted = graft.operators.ManifestTable.read(spark, s"$ivf/postings")
        .select("vec_id").as[Long].collect().sorted.toSeq
      assert(posted == kept,
        s"index diverged from the kept set: posted=$posted kept=$kept")
    } finally q.stop()
    spark.catalog.clearCache()
  }
}
