package graft

import org.apache.spark.sql.functions.{col, md5}

import graft.operators.{CorpusStore, ManifestTable}

/** [[CorpusStore.forget]] — the content purge. The hard claims: victims
  * vanish from all three kinds, nothing else moves (file-for-file), exact
  * redelivery can never resurrect a purged text, pre-blocking works, and
  * the operation is idempotent.
  */
class StoreForgetSpec extends SparkSpec {

  private def freshStore(): (String, org.apache.spark.sql.DataFrame) = {
    val root = java.nio.file.Files.createTempDirectory("graft_forget").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    (0 until 2).foreach { i =>
      CorpusStore.tick(docs.filter(col("doc_id") % 2 === i), root,
        tickId = Some(s"w$i"))
    }
    (root, docs)
  }

  test("purge removes the doc + its dedup state, touches only its files, " +
    "and is idempotent") {
    val (root, _) = freshStore()
    val before = CorpusStore.read(spark, root).collect()
    val victim = before.minBy(_.getAs[Long]("doc_id"))
    val vMd5 = victim.getAs[String]("text_md5")
    val vId = victim.getAs[Long]("doc_id")
    val liveBefore = ManifestTable.liveFiles(spark, root)

    val r = CorpusStore.forget(spark, root, Seq(vMd5))
    assert(r.nPurgedDocs === 1L && r.nNewTombstones === 1L)
    assert(r.nFilesRewritten > 0)

    // the doc is gone; everyone else survived bit-for-bit
    val after = CorpusStore.read(spark, root).collect()
    assert(!after.exists(_.getAs[Long]("doc_id") == vId))
    assert(after.map(_.toString).sorted.toSeq ===
      before.filterNot(_.getAs[Long]("doc_id") == vId)
        .map(_.toString).sorted.toSeq)

    // dedup state purged: no shingle rows, no band postings for the victim
    val liveAfter = ManifestTable.liveFiles(spark, root)
    val dd = ManifestTable.dataDir(root)
    def kindRows(kind: String) = {
      val fs = liveAfter.filter(_.startsWith(s"p_kind=$kind/"))
      if (fs.isEmpty) spark.emptyDataFrame
      else spark.read.option("basePath", dd)
        .parquet(fs.map(f => s"$dd/$f"): _*)
    }
    assert(kindRows("sh").filter(col("doc_id") === vId).count() === 0L)
    assert(kindRows("band").filter(col("doc_id") === vId).count() === 0L)
    // and the md5 is tombstoned
    assert(kindRows("tomb").filter(col("text_md5") === vMd5).count() === 1L)

    // untouched files carried forward AS-IS (file-level rewrite, not a
    // partition or store rewrite)
    val untouched = liveBefore.toSet.intersect(liveAfter.toSet)
    assert(untouched.nonEmpty, "purge rewrote every live file")
    assert(liveBefore.toSet.diff(liveAfter.toSet).size === r.nFilesRewritten)

    // idempotent: nothing left to do
    val v = ManifestTable.currentVersion(spark, root).get
    val r2 = CorpusStore.forget(spark, root, Seq(vMd5))
    assert(r2 === CorpusStore.ForgetReport(v, 0L, 0L, 0))
    assert(ManifestTable.currentVersion(spark, root).get === v,
      "no-op purge minted a version")
  }

  test("exact redelivery of a purged text drops at the exact stage; " +
    "pre-blocking an unseen md5 keeps it out forever") {
    val (root, docs) = freshStore()
    val victim = CorpusStore.read(spark, root).collect()
      .maxBy(_.getAs[Long]("doc_id"))
    val vMd5 = victim.getAs[String]("text_md5")
    val vTick = victim.getAs[String]("tick")

    // pre-block: a text the store has never seen
    import spark.implicits._
    val blockedText = "this text is blocked before it ever arrives " * 10 +
      "and is long and diverse enough to pass the quality gate easily"
    val blockedMd5 = Seq(blockedText).toDF("text")
      .select(md5(col("text"))).collect()(0).getString(0)

    val r = CorpusStore.forget(spark, root, Seq(vMd5, blockedMd5))
    assert(r.nPurgedDocs === 1L && r.nNewTombstones === 2L)

    // redeliver the victim's ORIGINAL wave as an unnamed tick (the marker
    // fast path must not hide the semantic check) plus the blocked text
    val wave = if (vTick == "w0") 0 else 1
    val redelivery = docs.filter(col("doc_id") % 2 === wave)
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
      .union(Seq((990001L, "en", "web", blockedText))
        .toDF("doc_id", "lang", "source", "text"))
    val rep = CorpusStore.tick(redelivery, root, tickId = None)
    assert(rep.nKept === 0L,
      s"redelivery re-ingested ${rep.nKept} docs after the purge")
    val after = CorpusStore.read(spark, root)
    assert(after.filter(col("text_md5").isin(vMd5, blockedMd5)).count() === 0L)
    assert(after.filter(col("doc_id") === 990001L).count() === 0L)
  }

  test("malformed hashes fail loud; a never-seen md5 is tomb-only") {
    val (root, _) = freshStore()
    val ex = intercept[IllegalArgumentException] {
      CorpusStore.forget(spark, root, Seq("not-an-md5"))
    }
    assert(ex.getMessage.contains("md5"))
    val before = CorpusStore.read(spark, root).count()
    val r = CorpusStore.forget(spark, root, Seq("0123456789abcdef" * 2))
    assert(r.nPurgedDocs === 0L && r.nNewTombstones === 1L)
    assert(CorpusStore.read(spark, root).count() === before)
  }
}
