package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's operational loop as a deterministic batch utility
  * (SURVEY.md §3.2, §2.9): resume from the sink's MAX(ts) watermark (S6),
  * re-read a trailing overlap for late/revised rows
  * (`collectors/binance.py:152-153`), and upsert with last-write-wins
  * semantics (S8/S9) over a date-partitioned parquet sink — the
  * object-storage analog of `ON CONFLICT DO UPDATE`.
  *
  * Durability: the merged slice is written to a STAGING directory first and
  * partition directories are swapped in afterwards — never an in-place
  * overwrite of data the plan is still reading (a localCheckpoint +
  * self-overwrite would lose the only copy if an executor died mid-write).
  * On a real deployment a table format (Delta/Iceberg) supplies the atomic
  * commit; the staging swap is the dependency-free equivalent.
  *
  * Scale: only partitions holding new data OR existing versions of the
  * batch's keys are rewritten; the watermark reads just the latest
  * partition (partition listing, not a full scan).
  */
object Incremental {

  private def fsOf(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def partitionDirs(spark: SparkSession, sinkPath: String): Seq[String] = {
    val fs = fsOf(spark, sinkPath)
    val root = new Path(sinkPath)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("p_date="))
      .map(_.getPath.getName)
  }

  /** S6: the sink's resume point — MAX(ts) of the LATEST date partition
    * (the max timestamp always lives there), not a full-sink scan.
    */
  def sinkWatermark(spark: SparkSession, sinkPath: String,
                    tsCol: String): Option[java.sql.Timestamp] = {
    val parts = partitionDirs(spark, sinkPath)
    if (parts.isEmpty) None
    else spark.read.parquet(s"$sinkPath/${parts.max}")
      .agg(max(col(tsCol))).collect().headOption
      .flatMap(r => Option(r.getTimestamp(0)))
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
    val fs = fsOf(spark, sinkPath)

    val wm = sinkWatermark(spark, sinkPath, tsCol)
    val newData = wm match {
      case Some(w) =>
        source.filter(col(tsCol) > lit(w) - expr(s"INTERVAL $overlap"))
      case None => source
    }
    val withDate = newData.withColumn("p_date", to_date(col(tsCol)))
    val lwwWindow = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(seqCols.map(c => col(c).desc): _*)
    def lww(df: DataFrame): DataFrame =
      df.withColumn("__rn", row_number().over(lwwWindow))
        .filter(col("__rn") === 1).drop("__rn")

    val (merged, updatedCount, touchedDates) = wm match {
      case Some(_) =>
        val sink = spark.read.parquet(sinkPath)
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
      case None =>
        // first tick still needs LWW: the batch itself can carry key dups
        (lww(withDate), 0L,
          withDate.select(col("p_date")).distinct()
            .collect().map(_.getDate(0).toString).toSeq)
    }

    // stage, then swap: delete EVERY touched sink partition (a partition
    // whose rows all merged away produces no staging dir but must still
    // vanish — e.g. a revision moved its only key to another date), then
    // rename the staged dirs in
    val staging = s"$sinkPath.__staging"
    fs.delete(new Path(staging), true)
    merged.write.mode(SaveMode.Overwrite).partitionBy("p_date").parquet(staging)
    val n = spark.read.parquet(staging).count()
    fs.mkdirs(new Path(sinkPath))
    touchedDates.foreach { d =>
      fs.delete(new Path(s"$sinkPath/p_date=$d"), true)
    }
    partitionDirs(spark, staging).foreach { part =>
      fs.rename(new Path(s"$staging/$part"), new Path(s"$sinkPath/$part"))
    }
    fs.delete(new Path(staging), true)

    val newKeys = withDate.select(keyCols.map(col): _*).distinct().count()
    SyncStats(n, newKeys - updatedCount, updatedCount)
  }
}
