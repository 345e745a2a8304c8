package graft

import org.apache.spark.sql.functions.{col, md5}

import graft.operators.{CorpusStore, IvfStore, ManifestTable}

/** Right-to-be-forgotten COMPOSED with the vector index: after
  * `tickWithIndex` builds a store+index and `forgetWithIndex` purges a
  * document, neither the corpus read nor any IVF search can return it —
  * the round-12 compliance hole ([[CorpusStore.forget]] left postings
  * behind) is closed by [[IvfStore.forget]]'s O(touched files) rewrite.
  */
class IvfForgetSpec extends SparkSpec {

  private def platformStore(): (String, String,
      org.apache.spark.sql.DataFrame) = {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val root = java.nio.file.Files.createTempDirectory("graft_ivfforget")
      .toString
    val ivf = java.nio.file.Files.createTempDirectory("graft_ivfforget_ivf")
      .toString
    val n = 3
    (0 until n).foreach { i =>
      CorpusStore.tickWithIndex(
        docs.filter(col("doc_id") % n === i),
        emb.filter(col("vec_id") % n === i),
        root, ivf, s"wave$i")
    }
    (root, ivf, docs)
  }

  test("forgetWithIndex purges the doc AND its postings; no IVF search " +
    "path can return the victim; the purge is O(touched files) and " +
    "idempotent") {
    val (root, ivf, docs) = platformStore()
    try {
      val kept = CorpusStore.read(spark, root).collect()
      val victim = kept.maxBy(_.getAs[Long]("doc_id"))
      val vId = victim.getAs[Long]("doc_id")
      val vMd5 = victim.getAs[String]("text_md5")
      val pr = s"$ivf/postings"
      val postedBefore = ManifestTable.read(spark, pr)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(postedBefore.contains(vId), "fixture: victim not indexed")
      val filesBefore = ManifestTable.liveFiles(spark, pr)
      val mvBefore = IvfStore.modelVersionOf(spark, ivf,
        ManifestTable.currentVersion(spark, pr).get)

      val r = CorpusStore.forgetWithIndex(spark, root, ivf, Seq(vMd5))
      assert(r.nPurgedDocs == 1L, s"corpus purge reported $r")

      // the posting is gone; every other posting survived
      val postedAfter = ManifestTable.read(spark, pr)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(postedAfter == postedBefore - vId,
        "index purge removed the wrong posting set")

      // O(touched files): untouched postings files carried forward as-is
      val filesAfter = ManifestTable.liveFiles(spark, pr)
      assert(filesBefore.toSet.intersect(filesAfter.toSet).nonEmpty ||
        filesBefore.size <= 1,
        "index purge rewrote every postings file")

      // the new snapshot still pairs with the same model, and every
      // search form answers WITHOUT the victim
      val pvAfter = ManifestTable.currentVersion(spark, pr).get
      assert(IvfStore.modelVersionOf(spark, ivf, pvAfter) == mvBefore,
        "purge broke the model/postings pairing")
      val hits = IvfStore.annIvfSelf(spark, ivf, k = 8, nProbe = 8,
        nQueries = 4).collect()
      assert(hits.nonEmpty, "post-purge search returned nothing")
      assert(!hits.exists(_.getAs[Long]("neighbor_id") == vId),
        "annIvfSelf returned a purged document")

      // idempotent on both sides: nothing to do, no version minted
      val vCorpus = ManifestTable.currentVersion(spark, root).get
      val r2 = CorpusStore.forgetWithIndex(spark, root, ivf, Seq(vMd5))
      assert(r2.nPurgedDocs == 0L && r2.nNewTombstones == 0L)
      assert(ManifestTable.currentVersion(spark, root).contains(vCorpus))
      assert(ManifestTable.currentVersion(spark, pr).contains(pvAfter),
        "idempotent re-purge minted a postings version")
      val ri = IvfStore.forget(spark, ivf, Seq(vId))
      assert(ri == IvfStore.IvfForgetReport(pvAfter, 0L, 0),
        s"direct idempotent index purge was not a no-op: $ri")
    } finally spark.catalog.clearCache()
  }

  test("crash-order safety: an index purge that already landed is a no-op " +
    "on retry, and the corpus purge still completes") {
    val (root, ivf, _) = platformStore()
    try {
      val victim = CorpusStore.read(spark, root).collect()
        .minBy(_.getAs[Long]("doc_id"))
      val vId = victim.getAs[Long]("doc_id")
      val vMd5 = victim.getAs[String]("text_md5")
      // simulate the crash window: index purge landed, corpus purge didn't
      val ri = IvfStore.forget(spark, ivf, Seq(vId))
      assert(ri.nPurged >= 1L, s"fixture: index purge found nothing: $ri")
      // the retry (the full composed call) re-resolves the same victim,
      // no-ops on the index, and completes the corpus side
      val r = CorpusStore.forgetWithIndex(spark, root, ivf, Seq(vMd5))
      assert(r.nPurgedDocs == 1L)
      assert(!CorpusStore.read(spark, root).collect()
        .exists(_.getAs[Long]("doc_id") == vId))
      assert(!ManifestTable.read(spark, s"$ivf/postings")
        .filter(col("vec_id") === vId).collect().nonEmpty)
    } finally spark.catalog.clearCache()
  }

  test("forget of ids with no postings (or an empty index) is a typed " +
    "no-op") {
    val ivf = java.nio.file.Files.createTempDirectory("graft_ivfempty")
      .toString
    assert(IvfStore.forget(spark, ivf, Seq(123L)) ==
      IvfStore.IvfForgetReport(0L, 0L, 0))
  }
}
