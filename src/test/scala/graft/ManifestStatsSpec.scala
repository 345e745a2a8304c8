package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.operators.{Incremental, ManifestTable}
import graft.operators.ManifestTable.FileEntry

/** Manifest-level min/max file skipping: footer stats ride the manifest at
  * commit time; range reads prune files by pure metadata (the same pruning
  * Delta/Iceberg do). Safety first: a file without stats is never skipped,
  * and pre-stats manifests (bare-path lines) stay readable unchanged.
  */
class ManifestStatsSpec extends SparkSpec {
  import spark.implicits._

  /** Commit `ranges` as one file each of longs [lo, hi] on column `seq`. */
  private def tableWithFiles(root: String, ranges: Seq[(Long, Long)]): Unit =
    ranges.foreach { case (lo, hi) =>
      val staging = s"$root/_staging/${java.util.UUID.randomUUID()}"
      (lo to hi).toDF("seq").withColumn("payload", col("seq") * 10)
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(staging)
      val added = ManifestTable.publishFiles(spark, root, staging)
      val meta = ManifestTable.footerMeta(
        spark, ManifestTable.dataDir(root), added, Seq("seq"))
      ManifestTable.commitEntries(spark, root, Seq.empty, meta.map(_._1))
    }

  test("readWhere plans only the files whose stats intersect the range") {
    val root = Files.createTempDirectory("graft_stats").toString + "/t"
    tableWithFiles(root, Seq((0L, 99L), (100L, 199L), (200L, 299L)))

    val entries = ManifestTable.liveEntries(spark, root)
    assert(entries.size == 3 && entries.forall(_.stats.contains("seq")))

    val one = ManifestTable.readWhere(spark, root, "seq", 120L, 150L)
    assert(one.inputFiles.length == 1) // metadata pruned 2 of 3 before the scan
    assert(one.filter(col("seq").between(120, 150)).count() == 31L)

    val two = ManifestTable.readWhere(spark, root, "seq", 90L, 110L) // straddles
    assert(two.inputFiles.length == 2)

    // fully outside every range: zero-file scan, schema preserved
    val none = ManifestTable.readWhere(spark, root, "seq", 1000L, 2000L)
    assert(none.count() == 0L)
    assert(none.columns.toSeq == Seq("seq", "payload"))
  }

  test("files without stats are never pruned; bare-path manifests still read") {
    val root = Files.createTempDirectory("graft_stats2").toString + "/t"
    val staging = s"$root/_staging/${java.util.UUID.randomUUID()}"
    (0L to 9L).toDF("seq").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(staging)
    val added = ManifestTable.publishFiles(spark, root, staging)
    // pre-stats manifest: bare paths, no stats column
    ManifestTable.commitReplace(spark, root, Seq.empty, added)

    assert(ManifestTable.liveEntries(spark, root).forall(_.stats.isEmpty))
    // a range that would prune the file if its stats were known
    val df = ManifestTable.readWhere(spark, root, "seq", 1000L, 2000L)
    assert(df.inputFiles.length == 1) // kept: skipping unprovable
    assert(ManifestTable.read(spark, root).count() == 10L)

    assert(ManifestTable.pruneEntries(
      Seq(FileEntry("a.parquet"), FileEntry("b.parquet", Map("seq" -> (0L, 5L)))),
      "seq", 100L, 200L).map(_.path) == Seq("a.parquet"))
  }

  test("prune safety property: an entry is dropped iff provably disjoint (randomized)") {
    val rnd = new scala.util.Random(17)
    for (_ <- 1 to 500) {
      val entries = (1 to 10).map { i =>
        if (rnd.nextBoolean()) {
          val lo = rnd.nextInt(1000).toLong
          FileEntry(s"f$i.parquet", Map("c" -> (lo, lo + rnd.nextInt(200))))
        } else FileEntry(s"f$i.parquet") // no stats: must always survive
      }
      val qlo = rnd.nextInt(1200).toLong
      val qhi = qlo + rnd.nextInt(300)
      val kept = ManifestTable.pruneEntries(entries, "c", qlo, qhi)
        .map(_.path).toSet
      entries.foreach { e =>
        val mayOverlap = e.stats.get("c")
          .forall { case (mn, mx) => mx >= qlo && mn <= qhi }
        assert(kept.contains(e.path) == mayOverlap)
      }
    }
  }

  test("compaction preserves the tracked stat columns") {
    val root = Files.createTempDirectory("graft_stats4").toString + "/t"
    tableWithFiles(root, Seq((0L, 99L), (100L, 199L), (200L, 299L)))
    val (nBefore, nAfter) = graft.operators.Layout.compactTable(spark, root)
    assert(nBefore == 3L && nAfter < nBefore)
    val entries = ManifestTable.liveEntries(spark, root)
    assert(entries.forall(_.stats.contains("seq")))
    // skipping still works on the compacted snapshot
    assert(ManifestTable.readWhere(spark, root, "seq", 0L, 299L).count() == 300L)
    assert(ManifestTable.readWhere(spark, root, "seq", 5000L, 6000L).count() == 0L)
  }

  test("syncTick commits ts stats; sinkWatermark resolves from metadata alone") {
    val sink = Files.createTempDirectory("graft_stats3").toString + "/t"
    val batch = Seq(
      (1L, sqlTs("2024-01-01 10:00:00.123456"), "b1"),
      (2L, sqlTs("2024-01-02 11:30:00"), "b1"))
      .toDF("key", "ts", "batch")
    Incremental.syncTick(batch, sink, Seq("key"), Seq("batch"), "ts", "2 HOURS")

    val entries = ManifestTable.liveEntries(spark, sink)
    assert(entries.nonEmpty && entries.forall(_.stats.contains("ts")))
    // every file has stats → the watermark is metadata-only, micros-exact
    assert(Incremental.sinkWatermark(spark, sink, "ts").get ==
      sqlTs("2024-01-02 11:30:00"))
    // and a range read over one day plans only that day's file(s)
    val us = sqlTs("2024-01-01 00:00:00").getTime * 1000L
    val dayEnd = sqlTs("2024-01-01 23:59:59").getTime * 1000L
    val day1 = ManifestTable.readWhere(spark, sink, "ts", us, dayEnd)
    assert(day1.inputFiles.length < entries.size)
    assert(day1.select("key").as[Long].collect().toSeq == Seq(1L))
  }
}
