package graft

import org.apache.spark.sql.functions._
import graft.operators.IntervalJoin

/** Binned interval join: semantics equal the naive range join, bins stay
  * invisible, degenerate intervals drop out.
  */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private val facts = Seq(
    (1L, 0L), (2L, 5L), (3L, 15L), (4L, 16L), (5L, 31L), (6L, 32L),
    (7L, 47L), (8L, 100L), (9L, -3L)
  ).toDF("fact_id", "day")

  private val intervals = Seq(
    // spans multiple 16-wide bins
    (10L, 0L, 33L),
    // exactly one bin
    (11L, 16L, 32L),
    // bin-boundary straddle
    (12L, 15L, 17L),
    // empty and inverted: must match nothing
    (13L, 5L, 5L), (14L, 9L, 2L),
    // negative domain
    (15L, -5L, 1L)
  ).toDF("iv_id", "s", "e")

  test("binned join equals the naive range join, at several bin widths") {
    val naive = facts.join(intervals,
        col("day") >= col("s") && col("day") < col("e"))
      .select("fact_id", "iv_id")
      .as[(Long, Long)].collect().toSet
    assert(naive.nonEmpty)
    for (bw <- Seq(1L, 7L, 16L, 1000L)) {
      val binned = IntervalJoin.binnedJoin(
          facts, col("day"), intervals, col("s"), col("e"), bw)
        .select("fact_id", "iv_id")
        .as[(Long, Long)].collect()
      assert(binned.length === binned.toSet.size,
        s"duplicate matches at binWidth=$bw")
      assert(binned.toSet === naive, s"mismatch at binWidth=$bw")
    }
  }

  test("helper bin columns do not leak into the output") {
    val out = IntervalJoin.binnedJoin(
      facts, col("day"), intervals, col("s"), col("e"), 16L)
    assert(out.columns.toSet === Set("fact_id", "day", "iv_id", "s", "e"))
  }

  test("campaign window stats matches a direct recompute on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/orders.parquet").exists())
    val got = IntervalJoin.campaignWindowStats(spark, dir)
    val orders = Tables.orders(spark, dir)
      .select(to_date(col("o_orderdate")).as("od"), col("o_totalprice"))
    val windows = orders.select(trunc(col("od"), "month").as("campaign_start"))
      .distinct()
    val want = windows.join(orders,
        col("od") >= col("campaign_start") &&
          col("od") < date_add(col("campaign_start"), 10))
      .groupBy("campaign_start")
      .agg(count(lit(1)).as("n_orders"))
    val g = got.select("campaign_start", "n_orders")
      .as[(java.sql.Date, Long)].collect().toMap
    val w = want.as[(java.sql.Date, Long)].collect().toMap
    assert(g === w)
    assert(g.values.sum > 0)
  }
}
