package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.GapRepair

/** [[GapRepair.gapRanges]]'s two-level islands detection — the 100× fix
  * for the one-task global window: level 1 coalesces per slot-block in
  * parallel, level 2 merges boundary-touching ranges over metadata-sized
  * rows. These tests pin partitioned ≡ global on a large synthetic outage
  * and that the heavy window really is partitioned.
  */
class GapRepairSpec extends SparkSpec {

  private val step = 60000L // minute slots

  /** Missing-slot frame from (firstSlot, slotCount) islands. */
  private def missingOf(islands: Seq[(Long, Long)]): DataFrame =
    islands.map { case (s, n) =>
      spark.range(s, s + n).select((col("id") * step).as("ms"))
    }.reduce(_ unionByName _)
      .select((col("ms") / 1000).cast("timestamp").as("missing_minute"))

  /** The single-global-window form (the pre-round-14 implementation) —
    * the reference the partitioned one must equal bit-for-bit.
    */
  private def globalRanges(missing: DataFrame): Seq[(Long, Long)] = {
    val w = Window.orderBy(col("__ms"))
    missing
      .select(((col("missing_minute").cast("double") * 1000).cast("long"))
        .as("__ms"))
      .distinct()
      .withColumn("__island",
        expr(s"(__ms - pmod(__ms, $step)) div $step") - row_number().over(w))
      .groupBy(col("__island"))
      .agg(min(col("__ms")).as("start_ms"),
        (max(col("__ms")) + lit(step)).as("end_ms"))
      .select(col("start_ms"), col("end_ms")).orderBy(col("start_ms"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
  }

  private def ranges(missing: DataFrame, blockSlots: Long): Seq[(Long, Long)] =
    GapRepair.gapRanges(missing, "missing_minute", step, blockSlots)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("a large multi-block outage: partitioned island detection equals " +
    "the global form and the analytic expectation") {
    // a two-month contiguous minute outage (86,400 slots — spans 60 day
    // blocks), a three-day one, adjacent-but-separate singletons, and a
    // lone slot exactly at a block boundary
    val islands = Seq(
      (1000L, 4320L),           // 3 days, crosses two block boundaries
      (10000L, 1L), (10002L, 5L), // NOT adjacent (slot 10001 present)
      (GapRepair.BlockSlots * 100, 1L), // starts exactly on a boundary
      (200000L, 86400L))        // two months
    val missing = missingOf(islands)
    val expected = islands.sortBy(_._1)
      .map { case (s, n) => (s * step, (s + n) * step) }
    val got = ranges(missing, GapRepair.BlockSlots)
    assert(got == expected, s"partitioned ranges diverged: $got")
    assert(got == globalRanges(missing),
      "partitioned island detection != the global single-window form")
  }

  test("block size never changes output — only parallelism (blockSlots=1 " +
    "pushes ALL merging to the metadata pass)") {
    val islands = Seq((5L, 10L), (100L, 1L), (101L, 1L), (1439L, 3L),
      (2880L, 1440L))
    // note (100,1)+(101,1) ARE adjacent: they must merge into one range
    val missing = missingOf(islands)
    val want = globalRanges(missing)
    Seq(1L, 2L, 7L, 1440L, 1000000L).foreach { b =>
      assert(ranges(missing, b) == want, s"blockSlots=$b diverged")
    }
    // sanity: the adjacent singletons really did merge
    assert(want.contains((100L * step, 102L * step)))
  }

  test("sub-step slot offsets across a block boundary still merge (slot-" +
    "index adjacency, not raw-ms adjacency)") {
    // two adjacent slots straddling the day-block boundary, each with a
    // DIFFERENT sub-step offset: raw-ms adjacency (lag(end_ms) == start_ms)
    // does not hold between them, slot-index adjacency does — the global
    // single-window form coalesces them, so the partitioned form must too
    val b = GapRepair.BlockSlots
    val msVals = Seq(b * step - step + 7L, b * step + 13L) // slots b-1, b
    import spark.implicits._
    val missing = msVals.toDF("ms")
      .select((col("ms") / 1000).cast("timestamp").as("missing_minute"))
    val got = ranges(missing, b)
    assert(got == globalRanges(missing),
      s"offset slots across the boundary diverged from the global form: $got")
    assert(got.size == 1,
      s"boundary-straddling offset slots stayed split: $got")
  }

  test("the heavy level-1 window is PARTITIONED (the one-task global sort " +
    "is gone); only the metadata-scale merge window is global") {
    val df = GapRepair.gapRanges(missingOf(Seq((0L, 10L))), "missing_minute",
      step)
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
        w.partitionSpec.nonEmpty
    }
    assert(windows.contains(true),
      "no partitioned window in the plan — the slot-volume pass would " +
        "run through one task")
  }
}
