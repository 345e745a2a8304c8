package graft

import java.time.LocalDate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators._

class OrchestratorSpec extends SparkSpec {

  private def assertSameRows(label: String, got: DataFrame, want: DataFrame): Unit = {
    val missing = want.exceptAll(got).count()
    val extra = got.exceptAll(want).count()
    assert(missing == 0 && extra == 0,
      s"$label diverged from batch recompute: $missing missing, $extra extra rows")
  }

  test("simulated 13-day schedule converges every sink to the batch recompute") {
    val cutoff = sqlTs("2024-01-13 00:00:00")
    val trades = Tables.trades(spark, "/root/testdata/sf0.01")
      .filter(col("timestamp") < lit(cutoff))
      .persist()
    try {
      // exchange loses the Jan 3 00:00-06:00 bars until Jan 4: the sync
      // watermark passes the hole, so only the repair flow can fill it
      val outage = Orchestrator.Outage(
        sqlTs("2024-01-03 00:00:00"), sqlTs("2024-01-03 06:00:00"),
        sqlTs("2024-01-04 00:00:00"))
      val feed = new Orchestrator.SimulatedFeed(trades, Some(outage))
      val root = java.nio.file.Files.createTempDirectory("graft_orch").toString
      val pipe = new Orchestrator.Pipeline(spark, feed, root)

      val ticks = (1 to 13).map(d => sqlTs(f"2024-01-$d%02d 11:00:00"))
      val runs = pipe.runTicks(ticks)

      // the repair deployment fired and eventually wrote the healed bars
      val repairs = runs.filter(_.flow == "binance-1m-gap-repair-hourly")
      assert(repairs.nonEmpty, "gap repair never fired")
      assert(repairs.exists(_.stats.written > 0),
        "gap repair never backfilled the outage hole")
      // flows fired in serve order within each tick
      val jan5 = runs.filter(_.at == sqlTs("2024-01-05 11:00:00")).map(_.flow)
      assert(jan5 == Seq("binance-1m-every-5sec", "binance-1m-gap-repair-hourly",
        "option-ohlc-hourly", "daily-11-utc", "weekly-friday-11-utc")
        || jan5 == Seq("binance-1m-every-5sec", "option-ohlc-hourly",
          "daily-11-utc", "weekly-friday-11-utc"))

      def sink(path: String, like: DataFrame): DataFrame =
        Incremental.readSink(spark, path).select(like.columns.map(col).toSeq: _*)

      val batch1m = Ohlc.minuteOhlc(trades)
      assertSameRows("bars_1m", sink(pipe.bars1mPath, batch1m), batch1m)

      val batchHourly = Ohlc.hourlyOhlc(trades)
      assertSameRows("option_ohlc", sink(pipe.hourlyPath, batchHourly), batchHourly)

      val batchDaily = Ohlc.dailySessions(Ohlc.hourlyBars(trades))
      assertSameRows("daily_sessions", sink(pipe.dailyPath, batchDaily), batchDaily)

      val batchWeekly = Ohlc.weeklySessions(batchDaily)
      assertSameRows("weekly_sessions", sink(pipe.weeklyPath, batchWeekly), batchWeekly)

      // no last Friday in the simulated window -> the monthly deployment's
      // inside-check never passed and the sink was never created
      assert(ManifestTable.currentVersion(spark, pipe.monthlyPath).isEmpty)

      // crash-replay safety: re-running the last tick (a restarted scheduler
      // re-fires the same schedule slot) must leave every sink's CONTENT
      // unchanged — LWW re-upserts of identical recomputed rows
      val before = Seq(pipe.bars1mPath, pipe.hourlyPath, pipe.dailyPath, pipe.weeklyPath)
        .map(p => Incremental.readSink(spark, p).collect().toSet)
      pipe.runTick(ticks.last)
      val after = Seq(pipe.bars1mPath, pipe.hourlyPath, pipe.dailyPath, pipe.weeklyPath)
        .map(p => Incremental.readSink(spark, p).collect().toSet)
      before.zip(after).zipWithIndex.foreach { case ((b, a), i) =>
        assert(a == b, s"sink $i changed on tick replay")
      }
    } finally {
      trades.unpersist()
      spark.catalog.clearCache()
    }
  }

  test("last-Friday check mirrors the reference's run-and-check-inside workaround") {
    assert(Orchestrator.isLastFriday(LocalDate.of(2024, 1, 26)))
    assert(!Orchestrator.isLastFriday(LocalDate.of(2024, 1, 12)))
    assert(!Orchestrator.isLastFriday(LocalDate.of(2024, 1, 27))) // Saturday
    assert(Orchestrator.isLastFriday(LocalDate.of(2024, 2, 23)))
    assert(!Orchestrator.isLastFriday(LocalDate.of(2024, 2, 16)))
  }
}
