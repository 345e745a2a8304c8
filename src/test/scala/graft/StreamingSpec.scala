package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingOhlc
import graft.streaming.StreamingOhlc.TradeEvent

/** Structured Streaming semantics: watermarked hourly OHLC in update mode
  * matches the batch aggregation; late data inside the watermark revises its
  * bucket; mapGroupsWithState keeps running per-instrument OHLC.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def trade(ts: String, price: Double, id: Long,
                    inst: String = "BTC", amount: Double = 1.0) =
    TradeEvent(sqlTs(ts), inst, price, amount, id)

  test("streaming hourly OHLC (update mode) matches batch semantics incl. late data") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TradeEvent]
    val q = StreamingOhlc.hourlyOhlc(mem.toDF())
      .writeStream.format("memory").queryName("ohlc_test")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(
        trade("2024-01-01 10:00:10", 100.0, 1),
        trade("2024-01-01 10:30:00", 110.0, 2),
        trade("2024-01-01 11:00:00", 105.0, 3))
      q.processAllAvailable()
      // late row for hour 10 — inside the 2h watermark → bucket revised
      mem.addData(trade("2024-01-01 10:45:00", 90.0, 4))
      q.processAllAvailable()
      val rows = spark.table("ohlc_test")
        .groupBy("hour_ts", "instrument_name")
        .agg(org.apache.spark.sql.functions.expr("max_by(struct(open_price, high_price, low_price, close_price, volume, trade_count), trade_count) AS s"))
        .select("hour_ts", "s.*").collect()
        .map(r => r.getAs[java.sql.Timestamp]("hour_ts").toString -> r).toMap
      val h10 = rows("2024-01-01 10:00:00.0")
      assert(h10.getAs[Double]("open_price") == 100.0)
      assert(h10.getAs[Double]("high_price") == 110.0)
      assert(h10.getAs[Double]("low_price") == 90.0)
      assert(h10.getAs[Double]("close_price") == 90.0) // late row is latest by ts
      assert(h10.getAs[Long]("trade_count") == 3L)
    } finally q.stop()
  }

  test("file source → AvailableNow → foreachBatch LWW sink, end to end") {
    import java.nio.file.Files
    val srcDir = Files.createTempDirectory("graft_stream_src").toString
    val sinkDir = Files.createTempDirectory("graft_stream_sink").toString + "/out"
    val ckpt = Files.createTempDirectory("graft_stream_ckpt").toString

    // batch 1 lands as a file; includes a key that batch 2 revises
    Seq(trade("2024-01-01 10:00:00", 100.0, 1), trade("2024-01-01 10:05:00", 101.0, 2))
      .toDS().write.mode("overwrite").parquet(srcDir)

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(
        Seq.empty[TradeEvent].toDS().schema).parquet(srcDir)
      val q = stream.writeStream
        .foreachBatch(StreamingOhlc.foreachBatchUpsert(sinkDir,
          Seq("instrument_name", "trade_id")) _)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    assert(spark.read.parquet(sinkDir).count() == 2)

    // a second file arrives; checkpoint resumes past the first
    Seq(trade("2024-01-01 10:05:00", 999.0, 2), trade("2024-01-01 10:10:00", 102.0, 3))
      .toDS().write.mode("append").parquet(srcDir)
    runOnce()
    val rows = spark.read.parquet(sinkDir)
    // trade 2 appears twice across batch files (append sink); latest batch wins
    val t2 = rows.filter(org.apache.spark.sql.functions.col("trade_id") === 2L)
      .orderBy(org.apache.spark.sql.functions.col("__batch_id").desc)
      .collect()
    assert(t2.head.getAs[Double]("price") == 999.0)
    assert(rows.select("trade_id").distinct().count() == 3)
  }

  test("mapGroupsWithState keeps running OHLC per instrument across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TradeEvent]
    val q = StreamingOhlc.runningOhlcState(mem.toDS())
      .writeStream.format("memory").queryName("state_test")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(trade("2024-01-01 10:00:00", 100.0, 1), trade("2024-01-01 10:01:00", 120.0, 2))
      q.processAllAvailable()
      mem.addData(trade("2024-01-01 10:02:00", 80.0, 3))
      q.processAllAvailable()
      val last = spark.table("state_test")
        .orderBy(org.apache.spark.sql.functions.col("n").desc).collect().head
      assert(last.getAs[Double]("open") == 100.0)
      assert(last.getAs[Double]("high") == 120.0)
      assert(last.getAs[Double]("low") == 80.0)
      assert(last.getAs[Double]("close") == 80.0)
      assert(last.getAs[Long]("n") == 3L)
    } finally q.stop()
  }
}
