package graft.operators

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's operational loop as a deterministic batch utility
  * (SURVEY.md §3.2, §2.9): resume from the sink's MAX(ts) watermark (S6),
  * re-read a trailing overlap for late/revised rows
  * (`collectors/binance.py:152-153`), and upsert with last-write-wins
  * semantics (S8/S9) over a date-partitioned sink — the object-storage
  * analog of `ON CONFLICT DO UPDATE`.
  *
  * Durability: the sink is a [[ManifestTable]] — the merged slice is staged,
  * published under never-colliding names, and made visible by ONE atomic
  * manifest rename. There is no delete-before-commit window: a crash at any
  * point leaves the previous snapshot fully readable (the reference gets the
  * same guarantee from Postgres's transactional upsert,
  * `aggregators/base.py:155-238`).
  *
  * Scale: only partitions holding new data OR existing versions of the
  * batch's keys are rewritten; the watermark reads just the latest
  * partition's files straight off the manifest — no directory listing, no
  * full-sink scan.
  */
object Incremental {

  /** Read the current snapshot of a sync sink. */
  def readSink(spark: SparkSession, sinkPath: String): DataFrame =
    ManifestTable.read(spark, sinkPath)

  private def livePartitions(spark: SparkSession, sinkPath: String): Seq[String] =
    ManifestTable.liveFiles(spark, sinkPath)
      .map(f => f.takeWhile(_ != '/'))
      .filter(_.startsWith("p_date=")).distinct

  /** S6: the sink's resume point — MAX(ts) of the LATEST date partition
    * (the max timestamp always lives there), not a full-sink scan.
    */
  def sinkWatermark(spark: SparkSession, sinkPath: String,
                    tsCol: String): Option[java.sql.Timestamp] = {
    val parts = livePartitions(spark, sinkPath)
    if (parts.isEmpty) None
    else {
      val latest = parts.max // p_date=YYYY-MM-DD sorts lexically = temporally
      val files = ManifestTable.liveFiles(spark, sinkPath)
        .filter(_.startsWith(latest + "/"))
        .map(f => s"${ManifestTable.dataDir(sinkPath)}/$f")
      spark.read.option("basePath", ManifestTable.dataDir(sinkPath))
        .parquet(files: _*)
        .agg(max(col(tsCol))).collect().headOption
        .flatMap(r => Option(r.getTimestamp(0)))
    }
  }

  /** Per-tick outcome, mirroring the reference's inserted-vs-updated
    * tracking (`RETURNING (xmax = 0)`, `collectors/binance.py:111`).
    */
  case class SyncStats(written: Long, inserted: Long, updated: Long)

  /** One sync tick. `keyCols` identify a row (upsert key); `seqCols` order
    * arrivals (latest wins, must be totally ordering).
    */
  def syncTick(source: DataFrame, sinkPath: String,
               keyCols: Seq[String], seqCols: Seq[String],
               tsCol: String, overlap: String): SyncStats = {
    val spark = source.sparkSession
    val wm = sinkWatermark(spark, sinkPath, tsCol)
    val newData = wm match {
      case Some(w) =>
        source.filter(col(tsCol) > lit(w) - expr(s"INTERVAL $overlap"))
      case None => source
    }
    mergeAndCommit(newData, sinkPath, keyCols, seqCols, tsCol,
      sinkExists = wm.isDefined)
  }

  /** Upsert WITHOUT the watermark filter — the gap-repair path
    * ([[GapRepair]], `collectors/binance_1m.py:404-507`): refetched rows are
    * older than the sink's watermark by construction, so the tick filter
    * would drop exactly the rows being repaired. The source is expected to
    * be range-bounded already (the API's start/end_timestamp params).
    */
  def backfill(source: DataFrame, sinkPath: String,
               keyCols: Seq[String], seqCols: Seq[String],
               tsCol: String): SyncStats =
    mergeAndCommit(source, sinkPath, keyCols, seqCols, tsCol,
      sinkExists = ManifestTable.currentVersion(source.sparkSession, sinkPath).isDefined)

  private def mergeAndCommit(newData: DataFrame, sinkPath: String,
                             keyCols: Seq[String], seqCols: Seq[String],
                             tsCol: String, sinkExists: Boolean): SyncStats = {
    val spark = newData.sparkSession
    val withDate = newData.withColumn("p_date", to_date(col(tsCol)))
    val lwwWindow = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(seqCols.map(c => col(c).desc): _*)
    def lww(df: DataFrame): DataFrame =
      df.withColumn("__rn", row_number().over(lwwWindow))
        .filter(col("__rn") === 1).drop("__rn")

    val (merged, updatedCount, touchedDates) =
      if (sinkExists) {
        val sink = readSink(spark, sinkPath)
        val batchKeys = withDate.select(keyCols.map(col): _*).distinct()
        // partitions to rewrite: those with new data PLUS those holding an
        // existing version of a batch key (a revision may move a row across
        // the date boundary — the stale copy must not survive elsewhere)
        val affectedDates = sink
          .join(broadcast(batchKeys), keyCols, "left_semi")
          .select(col("p_date")).distinct()
        val touched = withDate.select(col("p_date")).distinct()
          .union(affectedDates).distinct()
        val existing = sink.join(broadcast(touched), Seq("p_date"), "left_semi")
        val upd = batchKeys
          .join(existing.select(keyCols.map(col): _*).distinct(), keyCols)
          .count()
        val dates = touched.collect().map(_.getDate(0).toString).toSeq
        (lww(existing.unionByName(withDate)), upd, dates)
      } else {
        // first tick still needs LWW: the batch itself can carry key dups
        (lww(withDate), 0L,
          withDate.select(col("p_date")).distinct()
            .collect().map(_.getDate(0).toString).toSeq)
      }

    // stage → publish → one atomic manifest rename. A partition whose rows
    // all merged away produces no staged files but is still listed as
    // replaced, so its stale files drop out of the new snapshot.
    val staging = s"$sinkPath/_staging/${UUID.randomUUID()}"
    merged.write.mode(SaveMode.Overwrite).partitionBy("p_date").parquet(staging)
    val added = ManifestTable.publishFiles(spark, sinkPath, staging)
    // row count from the parquet FOOTERS of the published files — one
    // metadata read per file, not a second full scan of the merged slice
    val n = footerRowCounts(spark,
      added.map(f => s"${ManifestTable.dataDir(sinkPath)}/$f"))
    if (added.nonEmpty || touchedDates.nonEmpty) {
      ManifestTable.commitReplace(spark, sinkPath,
        touchedDates.map(d => s"p_date=$d"), added)
      ManifestTable.vacuum(spark, sinkPath)
    }

    val newKeys = withDate.select(keyCols.map(col): _*).distinct().count()
    SyncStats(n, newKeys - updatedCount, updatedCount)
  }

  /** Total row count straight from the files' footer metadata. Footers are
    * opened CONCURRENTLY (bounded pool): each open is a filesystem
    * round-trip, and on object storage with many small files per tick a
    * sequential loop would serialize N network latencies on the driver —
    * partially giving back the full rescan this method exists to avoid.
    */
  private def footerRowCounts(spark: SparkSession, paths: Seq[String]): Long =
    if (paths.isEmpty) 0L
    else {
      val hconf = spark.sparkContext.hadoopConfiguration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(paths.size, 16))
      try {
        import scala.jdk.CollectionConverters._
        pool.invokeAll(
          paths.map { p =>
            new java.util.concurrent.Callable[Long] {
              def call(): Long = {
                val r = org.apache.parquet.hadoop.ParquetFileReader.open(
                  org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
                    new org.apache.hadoop.fs.Path(p), hconf))
                try r.getRecordCount finally r.close()
              }
            }
          }.asJava
        ).asScala.map(_.get()).sum
      } finally pool.shutdown()
    }
}
