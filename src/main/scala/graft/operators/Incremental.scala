package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's operational loop as a deterministic batch utility
  * (SURVEY.md §3.2, §2.9): resume from the sink's MAX(ts) watermark (S6),
  * re-read a trailing overlap for late/revised rows
  * (`collectors/binance.py:152-153`), and upsert with last-write-wins
  * semantics (S8/S9) — implemented as dynamic partition overwrite on a
  * date-partitioned parquet sink (the object-storage analog of
  * `ON CONFLICT DO UPDATE`).
  *
  * Scale design: only partitions touched by new data are rewritten (dynamic
  * overwrite); the merge unions existing rows of those partitions with the
  * new batch and keeps the latest row per key. Idempotent: replaying a tick
  * yields the same sink.
  */
object Incremental {

  /** S6: the sink's resume point, None when the sink doesn't exist yet. */
  def sinkWatermark(spark: SparkSession, sinkPath: String,
                    tsCol: String): Option[java.sql.Timestamp] = {
    val exists = new org.apache.hadoop.fs.Path(sinkPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(sinkPath))
    if (!exists) None
    else spark.read.parquet(sinkPath)
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
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    val wm = sinkWatermark(spark, sinkPath, tsCol)
    val newData = wm match {
      case Some(w) =>
        source.filter(col(tsCol) > lit(w) - expr(s"INTERVAL $overlap"))
      case None => source
    }
    val withDate = newData.withColumn("p_date", to_date(col(tsCol)))
    val touched = withDate.select("p_date").distinct()

    val (merged, updatedCount) = wm match {
      case Some(_) =>
        // existing rows of ONLY the touched partitions, via partition-pruned
        // semi join, then LWW across old+new
        val existing = spark.read.parquet(sinkPath)
          .join(broadcast(touched), Seq("p_date"), "left_semi")
        val all = existing.unionByName(withDate)
        val w = Window.partitionBy(keyCols.map(col): _*)
          .orderBy(seqCols.map(c => col(c).desc): _*)
        val m = all.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        // keys present in both sides = updates (the xmax=0 analog)
        val upd = withDate.select(keyCols.map(col): _*).distinct()
          .join(existing.select(keyCols.map(col): _*).distinct(), keyCols)
          .count()
        (m, upd)
      case None => (withDate, 0L)
    }
    // truncate lineage before writing: the merged plan READS the sink that
    // the write overwrites (Spark refuses / corrupts self-overwrites).
    // Touched partitions are bounded by the overlap window, so the
    // checkpoint materializes only the rewritten slice.
    val stable = merged.localCheckpoint(true)
    val n = stable.count()
    stable.write.mode(SaveMode.Overwrite).partitionBy("p_date").parquet(sinkPath)
    val newKeys = withDate.select(keyCols.map(col): _*).distinct().count()
    SyncStats(n, newKeys - updatedCount, updatedCount)
  }
}
