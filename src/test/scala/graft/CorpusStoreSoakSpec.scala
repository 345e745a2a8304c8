package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions.col

import graft.operators.{CorpusStore, ManifestTable}
import graft.operators.CorpusStore.StoreLayout

/** The empirical exponent behind the store's O(touched buckets) claim:
  * over a long run of small ticks (with routine compaction, the intended
  * operations cadence), the bytes a tick READS must stay bounded by the
  * batch it ingests — NOT grow with the store. This is the property that
  * makes per-tick cost viable at 100 TB: a production store is arbitrarily
  * large, the arriving batch is not, and every scan in the tick path is
  * file-pruned to the buckets the batch hashes to.
  *
  * Measured for real via a SparkListener summing executor inputMetrics
  * bytesRead per tick — not re-derived from the pruning code's own file
  * lists (which would prove the code agrees with itself, not that the
  * bytes are bounded).
  */
class CorpusStoreSoakSpec extends SparkSpec {

  test("soak: 30 ticks — per-tick scanned bytes stay flat while the " +
    "store grows ~30x") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val root = java.nio.file.Files.createTempDirectory("graft_soak").toString
    val bytes = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(end: SparkListenerTaskEnd): Unit = {
        val m = end.taskMetrics
        if (m != null) bytes.addAndGet(m.inputMetrics.bytesRead)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val n = 30
      // production-shaped layout: buckets >> per-batch touch count, so a
      // ~16-doc batch touches a small fixed set of dirs however large the
      // store gets
      val layout = StoreLayout(64, 64, 64)
      val perTick = (0 until n).map { i =>
        // settle the async listener bus so bytes attribute to THIS tick
        Thread.sleep(250)
        val t0 = bytes.get()
        val r = CorpusStore.tick(docs.filter(col("doc_id") % n === i), root,
          tickId = Some(f"soak$i%02d"), minQuality = 0.0, threshold = 0.999,
          layoutIfNew = Some(layout))
        // routine maintenance, same cadence a deployment would run: keeps
        // per-bucket file counts (and thus parquet open/footer overhead)
        // from growing without bound across the run
        if (i % 10 == 9) CorpusStore.compact(spark, root)
        Thread.sleep(250)
        (r, bytes.get() - t0)
      }
      val kept = perTick.map(_._1.nKept).sum
      val rowsAfterFirst = perTick.head._1.nKept
      val storeRows = CorpusStore.read(spark, root).count()
      assert(storeRows == kept, "store rows != sum of per-tick keepers")
      assert(rowsAfterFirst > 0 && storeRows >= 15L * rowsAfterFirst,
        s"store did not grow: first tick $rowsAfterFirst, final $storeRows")

      // windows, not single ticks (per-tick noise: marker/manifest IO,
      // listener attribution slop). Base = ticks 3..12 — past the
      // bootstrap ticks whose store side is near-empty; last = 20..29.
      // Compaction ticks read the whole store by design, so maintenance
      // cost is excluded from the INGEST-cost claim under test; ticks
      // right after one see the merged (cheapest) files either way.
      def avg(ix: Seq[Int]) = ix.map(i => perTick(i)._2).sum.toDouble / ix.size
      val ingestTicks = (0 until n).filterNot(i => i % 10 == 9)
      val base = avg(Range(3, 13).filter(ingestTicks.contains))
      val last = avg(Range(20, 30).filter(ingestTicks.contains))
      assert(base > 0, "listener captured no bytes — harness broken")
      val k = last / base
      info(f"soak scan cost: base=$base%.0f B/tick last=$last%.0f B/tick " +
        f"ratio=$k%.2f, store grew ${storeRows}/$rowsAfterFirst rows")
      // O(store) scanning would put this ratio near the store-growth
      // factor (~3x between the window midpoints alone, compounding every
      // round); O(touched buckets) keeps it near 1
      assert(k <= 2.0,
        f"per-tick scanned bytes grew $k%.2fx between windows — tick cost " +
          "is tracking store size, not batch size")

      // Bloom steady state — the strongest form of the O(touched) claim:
      // a tick whose texts share NO key with the store (the common case of
      // a mostly-fresh production batch) is skipped by the per-file blooms
      // at every level, so the store's parquet stays effectively UNREAD.
      // Two assertions, because no single physical counter isolates the
      // store side: task input metrics also count the tick's OWN work
      // (cache-block reads of its persisted frames; the bloom build
      // re-reading the just-published batch files — measured ~0.9 MB for
      // an in-memory 16-doc batch, all O(batch)). So (1) the PLANNED
      // store read set — the files the two-level prune leaves for the
      // exact and band scans, the exact lists readKindFiles receives —
      // must be a vanishing fraction of the store by bytes; (2) the
      // physically-measured tick cost must not exceed the ingest ticks'
      // (whose batches do the same O(batch) work AND hit the store).
      import spark.implicits._
      val fresh = (0 until 16).map { i =>
        (900000L + i,
          s"soak steady-state probe document $i " +
            (0 until 30).map(j => s"tok${i}_$j").mkString(" "),
          "en", "soak", 400L)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
      val lay = CorpusStore.layoutOf(spark, root)
      def byBucket(df: org.apache.spark.sql.DataFrame, key: String,
                   bucket: org.apache.spark.sql.Column) =
        df.select(col(key).cast("string").as("k"), bucket.as("b"))
          .distinct().collect().groupBy(_.getInt(1))
          .map { case (b, rs) => b -> rs.toSeq.map(_.getString(0)) }
      val md5s = fresh.select(
        org.apache.spark.sql.functions.md5(col("text")).as("text_md5"))
      val md5ByB = byBucket(md5s, "text_md5",
        CorpusStore.md5Bucket(col("text_md5"), lay))
      val bands = graft.operators.Dedup.explodedBands(
        graft.operators.Dedup.shingleSignatures(fresh),
        graft.operators.Dedup.NumHashes / graft.operators.Dedup.NumBands)
      val bandByB = byBucket(bands, "band_val",
        CorpusStore.bandBucket(col("band_id"), col("band_val"), lay))
      val planned =
        CorpusStore.bloomPrunedKindFiles(spark, root, "doc", md5ByB) ++
        CorpusStore.bloomPrunedKindFiles(spark, root, "tomb", md5ByB) ++
        CorpusStore.bloomPrunedKindFiles(spark, root, "band", bandByB)
      def du(f: java.io.File): Long =
        if (f.isFile) f.length
        else Option(f.listFiles).map(_.map(du).sum).getOrElse(0L)
      val dd = ManifestTable.dataDir(root)
      val plannedBytes = planned.map(f => du(new java.io.File(s"$dd/$f"))).sum
      val storeBytes = du(new java.io.File(dd))
      Thread.sleep(250)
      val f0 = bytes.get()
      val rf = CorpusStore.tick(fresh, root, tickId = Some("soakfresh"),
        minQuality = 0.0, threshold = 0.999)
      Thread.sleep(250)
      val freshBytes = bytes.get() - f0
      assert(rf.nKept == 16L, s"fresh steady-state batch not kept: $rf")
      info(f"steady state: planned store reads ${planned.size} files / " +
        f"$plannedBytes B of a $storeBytes B store; tick task input " +
        f"$freshBytes B vs ingest avg $last%.0f B")
      // a false-positive file or two is legitimate (fpp 0.01); what must
      // not happen is planning a store-sized read
      assert(plannedBytes < storeBytes / 10,
        s"a no-shared-keys tick planned $plannedBytes B of a $storeBytes " +
          "B store — bloom sidecars not delivering the steady state")
      assert(freshBytes <= last * 1.5,
        f"fresh-tick physical cost $freshBytes B exceeds the ingest " +
          f"ticks' $last%.0f B — store-independent cost bound broken")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      spark.catalog.clearCache()
    }
  }

  test("long soak (opt-in, GRAFT_SOAK_LONG=1): 100 ticks, compaction " +
    "every 10 — scan cost flat, steady state holds at every checkpoint") {
    // ~10 min of wall-clock — the extended-horizon form of the 30-tick
    // soak above, run on demand (results recorded in SCALE.md) rather
    // than taxing every build. Same measurement, 3.3x the horizon, plus
    // fresh-keys steady-state probes at ticks 40/70/100.
    assume(sys.env.get("GRAFT_SOAK_LONG").contains("1"),
      "set GRAFT_SOAK_LONG=1 to run the 100-tick soak")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val root = java.nio.file.Files.createTempDirectory("graft_soak100").toString
    val bytes = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(end: SparkListenerTaskEnd): Unit = {
        val m = end.taskMetrics
        if (m != null) bytes.addAndGet(m.inputMetrics.bytesRead)
      }
    }
    import spark.implicits._
    def freshBatch(tag: Int) = (0 until 16).map { i =>
      (1000000L + tag * 100L + i,
        s"long soak probe $tag $i " +
          (0 until 30).map(j => s"tk${tag}_${i}_$j").mkString(" "),
        "en", "soak", 400L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    spark.sparkContext.addSparkListener(listener)
    try {
      val n = 100
      val layout = StoreLayout(64, 64, 64)
      def du(f: java.io.File): Long =
        if (f.isFile) f.length
        else Option(f.listFiles).map(_.map(du).sum).getOrElse(0L)
      val dd = ManifestTable.dataDir(root)
      // checkpoint records: (tick, planned store-read bytes for a fresh
      // batch after the two-level prune, store bytes at that point) — the
      // same planned-set measurement as the 30-tick soak's steady-state
      // assertion (task input cannot isolate the store side)
      val steady = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
      val perTick = (0 until n).map { i =>
        Thread.sleep(250)
        val t0 = bytes.get()
        val r = CorpusStore.tick(docs.filter(col("doc_id") % n === i), root,
          tickId = Some(f"lsoak$i%03d"), minQuality = 0.0, threshold = 0.999,
          layoutIfNew = Some(layout))
        if (i % 10 == 9) CorpusStore.compact(spark, root)
        Thread.sleep(250)
        val cost = bytes.get() - t0
        if (i == 39 || i == 69 || i == 99) {
          val fresh = freshBatch(i)
          val lay = CorpusStore.layoutOf(spark, root)
          def byBucket(df: org.apache.spark.sql.DataFrame, key: String,
                       bucket: org.apache.spark.sql.Column) =
            df.select(col(key).cast("string").as("k"), bucket.as("b"))
              .distinct().collect().groupBy(_.getInt(1))
              .map { case (b, rs) => b -> rs.toSeq.map(_.getString(0)) }
          val md5ByB = byBucket(fresh.select(
            org.apache.spark.sql.functions.md5(col("text")).as("text_md5")),
            "text_md5", CorpusStore.md5Bucket(col("text_md5"), lay))
          val bandByB = byBucket(graft.operators.Dedup.explodedBands(
            graft.operators.Dedup.shingleSignatures(fresh),
            graft.operators.Dedup.NumHashes / graft.operators.Dedup.NumBands),
            "band_val",
            CorpusStore.bandBucket(col("band_id"), col("band_val"), lay))
          val planned =
            CorpusStore.bloomPrunedKindFiles(spark, root, "doc", md5ByB) ++
            CorpusStore.bloomPrunedKindFiles(spark, root, "tomb", md5ByB) ++
            CorpusStore.bloomPrunedKindFiles(spark, root, "band", bandByB)
          val plannedBytes =
            planned.map(f => du(new java.io.File(s"$dd/$f"))).sum
          val storeBytes = du(new java.io.File(dd))
          val rf = CorpusStore.tick(fresh, root,
            tickId = Some(s"lfresh$i"), minQuality = 0.0, threshold = 0.999)
          assert(rf.nKept == 16L, s"fresh probe at tick $i not kept: $rf")
          steady += ((i, plannedBytes, storeBytes))
        }
        (r, cost)
      }
      val storeRows = CorpusStore.read(spark, root).count()
      assert(storeRows == perTick.map(_._1.nKept).sum + 16L * steady.size,
        "store rows != keepers (ingest + fresh probes)")
      def avg(ix: Seq[Int]) = ix.map(i => perTick(i)._2).sum.toDouble / ix.size
      val ingest = (0 until n).filterNot(i => i % 10 == 9)
      val base = avg(Range(3, 13).filter(ingest.contains))
      val mid = avg(Range(45, 55).filter(ingest.contains))
      val last = avg(Range(90, 100).filter(ingest.contains))
      val storeBytes = du(new java.io.File(dd))
      info(f"100-tick soak: base=$base%.0f mid=$mid%.0f last=$last%.0f " +
        f"B/tick (ratio ${last / base}%.2f), store $storeRows rows / " +
        f"$storeBytes B; steady probes " +
        steady.map { case (i, p, s) => s"t$i=${p}B-of-${s}B" }.mkString(", "))
      assert(base > 0, "listener captured no bytes")
      assert(last / base <= 2.0,
        f"per-tick bytes grew ${last / base}%.2fx over 100 ticks")
      steady.foreach { case (i, p, s) =>
        assert(p < s / 10,
          s"steady-state probe at tick $i planned $p B of a $s B store")
      }
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      spark.catalog.clearCache()
    }
  }
}
