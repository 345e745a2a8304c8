package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's gap-repair loop (`collectors/binance_1m.py:404-507`):
  * detect missing rows against the expected timeline, coalesce them into
  * contiguous ranges, re-fetch each range from the paginated API, and upsert
  * into the sink.
  *
  * Detection is [[Maintenance.missingTimeline]]; this file adds the two
  * halves the reference performs around it — islands → fetch ranges, and the
  * range-bounded refetch + [[Incremental.backfill]] (NOT `syncTick`: repaired
  * rows are behind the sink watermark by construction, so the tick's
  * overlap filter would drop exactly the rows being repaired).
  *
  * Scale: the coalesced ranges are collected to the driver — they are
  * operator metadata (one row per OUTAGE, not per missing minute), the same
  * bounded-cardinality class as syncTick's touched-partition list. Each
  * range then becomes a parallel day-partitioned scan of the source.
  */
object GapRepair {

  /** Gaps-and-islands: coalesce missing timestamps (one row per missing
    * `stepMs` slot) into contiguous `[start_ms, end_ms)` ranges.
    * Consecutive slots have equal `slot − row_number`, so that difference
    * is the island key.
    */
  def gapRanges(missing: DataFrame, tsCol: String, stepMs: Long): DataFrame = {
    // global window: input is one row per missing slot — outage metadata,
    // bounded — not a data-volume path
    val w = Window.orderBy(col("__ms"))
    missing
      .select(((col(tsCol).cast("double") * 1000).cast("long")).as("__ms"))
      .distinct()
      // exact integer FLOOR slot index. Integer-only: long/long `/` is
      // floating-point division, and rounding on slots not aligned to exact
      // stepMs multiples would fragment one outage into several ranges.
      // pmod-then-div rather than bare `div`: `div` truncates toward zero,
      // so pre-1970 (negative-ms) slots straddling zero would merge into one
      // island; subtracting the non-negative pmod first makes the numerator
      // an exact floor multiple, giving true floor semantics for any sign.
      .withColumn("__island",
        expr(s"(__ms - pmod(__ms, $stepMs)) div $stepMs") - row_number().over(w))
      .groupBy(col("__island"))
      .agg(min(col("__ms")).as("start_ms"),
        (max(col("__ms")) + lit(stepMs)).as("end_ms"))
      .select(col("start_ms"), col("end_ms"))
      .orderBy(col("start_ms"))
  }

  /** Re-fetch `ranges` from a paged source (server-side bounded via
    * `readstartms`/`readendms` — the API's start/end_timestamp params) and
    * upsert them. Returns the combined sync stats.
    */
  def repair(spark: SparkSession, ranges: Seq[(Long, Long)],
             sourceFormat: String, sourceOptions: Map[String, String],
             sinkPath: String, keyCols: Seq[String], seqCols: Seq[String],
             tsCol: String): Incremental.SyncStats = {
    require(ranges.nonEmpty, "no gaps to repair")
    val refetched = ranges.map { case (s, e) =>
      spark.read.format(sourceFormat).options(sourceOptions)
        .option("readstartms", s.toString)
        .option("readendms", e.toString)
        .load()
    }.reduce(_ unionByName _)
    Incremental.backfill(refetched, sinkPath, keyCols, seqCols, tsCol)
  }
}
