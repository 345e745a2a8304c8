package graft

import org.apache.spark.sql.functions.col

import graft.operators.{CorpusStore, ManifestTable}

/** Two GENUINELY concurrent ticks to one store must BOTH land, with no
  * caller-side retry loop: the tick is an optimistic transaction — it
  * commits conditioned on the snapshot version it computed against, and on
  * a lost race it re-reads and RECOMPUTES internally, so the loser's dedup
  * sees the winner's keepers (the keeper set equals a serialized order's,
  * not a merge that missed cross-batch duplicates). Complements
  * [[CorpusStoreConcurrencySpec]], which drives at-least-once CALLER
  * retries through the same machinery.
  */
class ConcurrentTickSpec extends SparkSpec {

  private def wave(tag: Int, sharedText: Option[String]) = {
    import spark.implicits._
    (0 until 10).map { i =>
      val text =
        if (i == 0 && sharedText.nonEmpty) sharedText.get
        else s"race wave $tag doc $i " +
          (0 until 25).map(j => s"w${tag}_${i}_$j").mkString(" ")
      (tag * 1000L + i, text, "en", "race", 300L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("two concurrent ticks with a cross-batch exact duplicate both " +
    "commit (no caller retry) and the keeper set matches a serialized order") {
    val root = java.nio.file.Files.createTempDirectory("graft_tickrace")
      .toString
    val shared = "contested shared text " +
      (0 until 25).map(j => s"sh_$j").mkString(" ")
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val reports =
      new java.util.concurrent.ConcurrentHashMap[Int, CorpusStore.TickReport]()
    val start = new java.util.concurrent.CyclicBarrier(2)
    val threads = Seq(1, 2).map { tag =>
      new Thread(() => {
        try {
          val batch = wave(tag, Some(shared))
          start.await()
          // NO catch, NO loop: the tick's internal lose→recompute→retry
          // is the thing under test
          reports.put(tag, CorpusStore.tick(batch, root,
            tickId = Some(s"race$tag"), minQuality = 0.0,
            threshold = 0.999))
        } catch { case e: Throwable => errors.add(e) }
      })
    }
    try {
      threads.foreach(_.start())
      threads.foreach(_.join(300000))
      assert(errors.isEmpty, s"a tick died instead of retrying: " +
        s"${Option(errors.peek()).map(_.toString).getOrElse("")}")
      assert(reports.size == 2, "a tick never returned")

      // both committed: both markers present, two snapshots minted
      assert(CorpusStore.committedTicks(spark, root).toSet ==
        Set("race1", "race2"))
      assert(ManifestTable.currentVersion(spark, root).contains(2L),
        "expected exactly two committed versions")

      // exactly one copy of the contested text survived; the loser's copy
      // is tombstoned — i.e. the loser's recompute SAW the winner's keeper
      val docs = CorpusStore.read(spark, root).collect()
      val ids = docs.map(_.getAs[Long]("doc_id")).toSet
      val all = (Seq(1, 2).flatMap(t => (0 until 10).map(t * 1000L + _))).toSet
      assert(ids == all - 1000L || ids == all - 2000L,
        s"keeper set matches neither serialized order: kept $ids")
      assert(docs.count(_.getAs[String]("text_md5") == md5Hex(shared)) == 1,
        "the contested text survived twice (or vanished)")
      val dd = ManifestTable.dataDir(root)

      // the reports agree with a serialization: one tick kept all 10, the
      // other dropped its shared copy at the EXACT-vs-store stage (the
      // winner's kept doc row blocks it — no tombstone needed, the proof
      // the loser's recompute consulted the winner's snapshot)
      val byKept = Seq(1, 2).map(reports.get(_)).sortBy(_.nKept)
      assert(byKept.map(_.nKept) == Seq(9L, 10L),
        s"per-tick keeper counts ${byKept.map(_.nKept)}")
      assert(byKept.head.nExactNew == 9L,
        "the contested copy was not dropped at the exact-vs-store stage")

      // the lost attempt's published files were cleaned up: every file
      // under data/ is referenced by a retained manifest
      val referenced = ManifestTable.versions(spark, root)
        .flatMap(v => ManifestTable.filesOf(spark, root, v)).toSet
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val onDisk = {
        val it = fs.listFiles(new org.apache.hadoop.fs.Path(dd), true)
        val b = scala.collection.mutable.ListBuffer.empty[String]
        while (it.hasNext) {
          val p = it.next().getPath.toString
          val i = p.lastIndexOf("p_kind=")
          if (i >= 0 && p.endsWith(".parquet")) b += p.substring(i)
        }
        b.toSet
      }
      assert(onDisk == referenced,
        s"orphan data files leaked by the lost attempt: " +
          s"${(onDisk -- referenced).take(5)}")

      // dedup state intact: replaying either batch is a pure no-op
      val v = ManifestTable.currentVersion(spark, root)
      val rep = CorpusStore.tick(wave(1, Some(shared)), root,
        minQuality = 0.0, threshold = 0.999)
      assert(rep.nKept == 0L &&
        ManifestTable.currentVersion(spark, root) == v,
        s"replay after the race was not a no-op: $rep")
    } finally spark.catalog.clearCache()
  }
}
