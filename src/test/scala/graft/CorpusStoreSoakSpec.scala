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
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      spark.catalog.clearCache()
    }
  }
}
