package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.{GapRepair, Incremental, Maintenance}

/** DataSourceV2 paginated collector (`sources/PagedTradeSource.scala`):
  * cursor pagination + bounded retry, batch and micro-batch reads,
  * AvailableNow with checkpoint resume, and the gap-repair loop it enables.
  */
class PagedSourceSpec extends SparkSpec {
  import spark.implicits._

  private val Fmt = "graft.sources.PagedTradeSource"
  private val StartMs = 1704067200000L // 2024-01-01 UTC
  private val DayMs = 86400000L

  private def batchRead(opts: (String, String)*): DataFrame =
    spark.read.format(Fmt).options(opts.toMap).load()

  test("batch read paginates the full range: no dups, no holes, correct bounds") {
    val df = batchRead("rows" -> "15000", "intervalms" -> "20000", "pagesize" -> "1000")
    val (n, ids, mn, mx) = df.agg(count(lit(1)), countDistinct(col("trade_id")),
      min(col("trade_id")), max(col("trade_id")))
      .as[(Long, Long, Long, Long)].collect().head
    assert(n == 15000L && ids == 15000L && mn == 0L && mx == 14999L)
    // spans >3 days → >3 input partitions did the work
    assert(df.rdd.getNumPartitions >= 3)
  }

  test("transient page failures are retried and change nothing") {
    val stable = batchRead("rows" -> "5000", "intervalms" -> "20000",
      "pagesize" -> "500").orderBy("trade_id").collect()
    val flaky = batchRead("rows" -> "5000", "intervalms" -> "20000",
      "pagesize" -> "500", "failevery" -> "2").orderBy("trade_id").collect()
    assert(flaky.toSeq == stable.toSeq)
  }

  test("a page failing past maxRetries fails the task (no silent gap)") {
    val e = intercept[org.apache.spark.SparkException] {
      // every page's first `maxretries` attempts fail → retries exhausted
      batchRead("rows" -> "100", "intervalms" -> "20000", "pagesize" -> "100",
        "failevery" -> "1", "maxretries" -> "1").count()
    }
    assert(e.getMessage.contains("simulated transient API failure")
      || Option(e.getCause).exists(_.getMessage.contains("simulated")))
  }

  test("AvailableNow drains in day-bounded micro-batches and resumes from checkpoint") {
    val dir = java.nio.file.Files.createTempDirectory("graft_paged").toString
    val cp = s"$dir/cp"
    val out = s"$dir/out"

    def drain(rows: Int): Unit = {
      val q = spark.readStream.format(Fmt)
        .option("rows", rows.toString).option("intervalms", "20000")
        .option("pagesize", "1000").option("maxdayspertrigger", "1")
        .load()
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", cp)
        .foreachBatch { (batch: DataFrame, id: Long) =>
          batch.withColumn("__batch_id", lit(id))
            .write.mode("append").parquet(out)
        }
        .start()
      assert(q.awaitTermination(120000))
    }

    drain(10000) // ~2.3 days of data, 1 day per trigger → ≥3 micro-batches
    val first = spark.read.parquet(out)
    assert(first.count() == 10000L)
    assert(first.select("__batch_id").distinct().count() >= 3L)

    drain(15000) // API grew; checkpoint cursor must skip the first 10000
    val all = spark.read.parquet(out)
    assert(all.count() == 15000L) // 5000 new — nothing reprocessed
    assert(all.select("trade_id").distinct().count() == 15000L)
  }

  test("streaming foreachBatch syncTick matches the one-shot batch syncTick") {
    val dir = java.nio.file.Files.createTempDirectory("graft_paged_sync").toString
    val streamSink = s"$dir/stream"
    val batchSink = s"$dir/batch"
    val key = Seq("trade_id")
    val seq = Seq("timestamp", "trade_id")

    val q = spark.readStream.format(Fmt)
      .option("rows", "8000").option("intervalms", "20000")
      .option("pagesize", "1000").option("maxdayspertrigger", "1")
      .load()
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/cp")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Incremental.syncTick(batch, streamSink, key, seq, "timestamp", "1 HOURS"): Unit
      }
      .start()
    assert(q.awaitTermination(120000))

    val stats = Incremental.syncTick(
      batchRead("rows" -> "8000", "intervalms" -> "20000", "pagesize" -> "1000"),
      batchSink, key, seq, "timestamp", "1 HOURS")
    assert(stats.written == 8000L && stats.inserted == 8000L && stats.updated == 0L)

    val a = Incremental.readSink(spark, streamSink)
      .select("trade_id", "price", "amount").orderBy("trade_id").collect()
    val b = Incremental.readSink(spark, batchSink)
      .select("trade_id", "price", "amount").orderBy("trade_id").collect()
    assert(a.length == 8000 && a.toSeq == b.toSeq)
  }

  test("gap repair: detect missing range, refetch it from the API, backfill the sink") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gap").toString
    val sink = s"$dir/t"
    val key = Seq("trade_id")
    val seq = Seq("timestamp", "trade_id")
    // one trade per minute for 6 days
    val opts = Seq("rows" -> "8640", "intervalms" -> "60000", "pagesize" -> "1000")
    val (d2, d4) = (StartMs + 2 * DayMs, StartMs + 4 * DayMs)

    // land everything EXCEPT days 3-4 (a two-day collector outage)
    Incremental.syncTick(
      batchRead(opts :+ ("readendms" -> d2.toString): _*),
      sink, key, seq, "timestamp", "1 HOURS")
    Incremental.backfill(
      batchRead(opts :+ ("readstartms" -> d4.toString): _*),
      sink, key, seq, "timestamp")
    assert(Incremental.readSink(spark, sink).count() == 8640L - 2 * 1440L)

    // detect → coalesce to ranges → refetch → backfill
    val missing = Maintenance.missingTimeline(
      Incremental.readSink(spark, sink)
        .select(lit("ALL").as("event_type"), col("timestamp").as("ts")))
    val ranges = GapRepair.gapRanges(missing, "missing_minute", stepMs = 60000L)
      .as[(Long, Long)].collect().toSeq
    assert(ranges == Seq((d2, d4)))

    val stats = GapRepair.repair(spark, ranges, Fmt, opts.toMap,
      sink, key, seq, "timestamp")
    assert(stats.written == 2 * 1440L && stats.inserted == 2 * 1440L)
    val healed = Incremental.readSink(spark, sink)
    assert(healed.count() == 8640L)
    assert(healed.select("trade_id").distinct().count() == 8640L)
  }

  test("gapRanges uses floor slot indices: pre-1970 slots straddling zero stay separate islands") {
    import org.apache.spark.sql.functions.timestamp_micros
    // missing ms offsets -90s and +30s with a 60s step: FLOOR slots are
    // -2 and 0 — non-consecutive, so two islands. Truncate-toward-zero
    // (`div`) would map -90s to slot -1, adjacent to 0, merging one outage
    // range across the epoch where a slot (-1) is actually present.
    val df = Seq(-90000L, 30000L).toDF("ms")
      .select(timestamp_micros($"ms" * 1000).as("missing_minute"))
    val ranges = GapRepair.gapRanges(df, "missing_minute", stepMs = 60000L)
      .as[(Long, Long)].collect().toSeq
    assert(ranges == Seq((-90000L, -30000L), (30000L, 90000L)))
  }
}
