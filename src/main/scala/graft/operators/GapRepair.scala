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

  /** Slots per block for [[gapRanges]]'s partitioned first pass: at minute
    * granularity one block is a day. The choice only affects parallelism,
    * never output — blocks split islands at fixed boundaries and the
    * metadata-scale second pass re-merges exactly the adjacent ones.
    */
  val BlockSlots = 1440L

  /** Gaps-and-islands: coalesce missing timestamps (one row per missing
    * `stepMs` slot) into contiguous `[start_ms, end_ms)` ranges.
    * Consecutive slots have equal `slot − row_number`, so that difference
    * is the island key.
    *
    * TWO-LEVEL, for the 100× case: a multi-month outage at minute
    * granularity is tens of millions of missing-slot rows, which a single
    * global-ordering window would pull through ONE task. Level 1 runs the
    * islands window PARTITIONED by a fixed slot block (`blockSlots` slots,
    * default one day of minutes) — every block's slots coalesce in
    * parallel, emitting one range per (block, island). Level 2 re-merges
    * ranges that touch across block boundaries (`start_ms` equal to the
    * predecessor's `end_ms`) with a global window over the RANGES — rows
    * bounded by #outages + #blocks-spanned, genuine operator metadata
    * (one row per outage-day, not per missing minute). Output is
    * bit-identical to the single-window form (`GapRepairSpec` pins
    * partitioned ≡ global on a multi-block synthetic outage).
    */
  def gapRanges(missing: DataFrame, tsCol: String, stepMs: Long,
                blockSlots: Long = BlockSlots): DataFrame = {
    require(blockSlots >= 1, s"blockSlots must be >= 1, got $blockSlots")
    // exact integer FLOOR slot index. Integer-only: long/long `/` is
    // floating-point division, and rounding on slots not aligned to exact
    // stepMs multiples would fragment one outage into several ranges.
    // pmod-then-div rather than bare `div`: `div` truncates toward zero,
    // so pre-1970 (negative-ms) slots straddling zero would merge into one
    // island; subtracting the non-negative pmod first makes the numerator
    // an exact floor multiple, giving true floor semantics for any sign.
    val slotIdx = expr(s"(__ms - pmod(__ms, $stepMs)) div $stepMs")
    val wBlk = Window.partitionBy(col("__blk")).orderBy(col("__ms"))
    val blockRanges = missing
      .select(((col(tsCol).cast("double") * 1000).cast("long")).as("__ms"))
      .distinct()
      .withColumn("__slot", slotIdx)
      .withColumn("__blk",
        expr(s"(__slot - pmod(__slot, $blockSlots)) div $blockSlots"))
      // within one block the classic trick: consecutive slots share
      // `slot − row_number`; keyed by (block, island) so island ids never
      // collide across blocks
      .withColumn("__island", col("__slot") - row_number().over(wBlk))
      .groupBy(col("__blk"), col("__island"))
      .agg(min(col("__ms")).as("start_ms"),
        (max(col("__ms")) + lit(stepMs)).as("end_ms"),
        min(col("__slot")).as("__slot_start"),
        max(col("__slot")).as("__slot_end"))
    // level 2 — metadata-scale: merge range CHAINS the block boundary
    // split. Adjacency is judged on SLOT INDICES (lag(slot_end)+1 ==
    // slot_start), exactly the consecutiveness the single-window island
    // trick uses — raw-ms adjacency (lag(end_ms) == start_ms) only holds
    // when boundary-straddling slots differ by exactly stepMs, so slots
    // with inconsistent sub-step offsets would stay split here while the
    // global form coalesces them. Global ordering is safe here: one row
    // per (outage × touched block).
    val wg = Window.orderBy(col("start_ms"))
    val wgRun = wg.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    blockRanges
      .withColumn("__new",
        when(lag(col("__slot_end"), 1).over(wg) + 1 === col("__slot_start"), 0)
          .otherwise(1))
      .withColumn("__grp", sum(col("__new")).over(wgRun))
      .groupBy(col("__grp"))
      .agg(min(col("start_ms")).as("start_ms"),
        max(col("end_ms")).as("end_ms"))
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
