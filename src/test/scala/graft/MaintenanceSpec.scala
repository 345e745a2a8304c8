package graft

import org.apache.spark.sql.functions._

import graft.operators.Maintenance

/** Gap detection / timelines / dedup / parse (FIXTURES.md B4-B7). */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  /** Contiguous minutes 10:00-10:59 with 10:10-10:16 (7) and 10:30-10:32 (3)
    * excised (FIXTURES.md B5).
    */
  private def series = {
    val excised = (10 to 16) ++ (30 to 32)
    (0 to 59).filterNot(excised.contains)
      .map(m => (1L, sqlTs(f"2024-01-01 10:$m%02d:00"), 7L, "btc", 1.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("gapDetect finds exactly the excised ranges at threshold 5") {
    val gaps = Maintenance.gapDetect(series, thresholdMin = 5).collect()
    assert(gaps.length == 1)
    assert(gaps.head.getAs[Long]("gap_minutes") == 8L) // 10:09 → 10:17
    assert(gaps.head.getAs[Long]("missing_minutes") == 7L)
  }

  test("gapDetect at threshold 2 also reports the 3-minute excision") {
    val gaps = Maintenance.gapDetect(series, thresholdMin = 2)
      .orderBy("gap_start").collect()
    assert(gaps.map(_.getAs[Long]("missing_minutes")).toSeq == Seq(7L, 3L))
  }

  test("missingTimeline lists exactly the excised minutes") {
    val missing = Maintenance.missingTimeline(series)
      .select(col("missing_minute").cast("string")).as[String].collect().sorted
    val expected = ((10 to 16) ++ (30 to 32)).map(m => f"2024-01-01 10:$m%02d:00")
    assert(missing.length == 10)
    assert(missing.map(_.substring(0, 19)).toSeq == expected.toSeq)
  }

  test("last-write-wins vs first-wins dedup (B6)") {
    val df = Seq(
      (1L, sqlTs("2024-01-01 10:00:05"), 1L, "btc", 100.0, ""),
      (2L, sqlTs("2024-01-01 10:00:30"), 1L, "btc", 101.0, ""), // same minute, later
      (3L, sqlTs("2024-01-01 10:01:00"), 1L, "btc", 102.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val lww = Maintenance.dedupLastWriteWins(df).orderBy("m")
      .select("event_id").as[Long].collect().toSeq
    val fw = Maintenance.dedupFirstWins(df).orderBy("m")
      .select("event_id").as[Long].collect().toSeq
    assert(lww == Seq(2L, 3L))
    assert(fw == Seq(1L, 3L))
    // idempotence: re-applying on the deduped output is a no-op
    val again = Maintenance.dedupLastWriteWins(
      df.where(col("event_id").isin(2L, 3L))).count()
    assert(again == 2L)
  }

  test("parseInstrument round-trips valid names and drops malformed (B4)") {
    val names = Seq(
      "BTC-4JAN19-3500-P", "BTC-27DEC24-100000-C", "ETH-1MAY21-2000-C",
      "BTC-31FEB21-100-C", // impossible date
      "BTC-4XXX19-3500-P", // bad month
      "garbage", "MALFORMED-123")
      .toDF("instrument_name")
    val parsed = Maintenance.parseInstrument(names)
      .orderBy("instrument_name").collect()
    assert(parsed.map(_.getAs[String]("instrument_name")).toSeq ==
      Seq("BTC-27DEC24-100000-C", "BTC-4JAN19-3500-P", "ETH-1MAY21-2000-C"))
    val r = parsed.find(_.getString(0) == "BTC-4JAN19-3500-P").get
    assert(r.getAs[java.sql.Date]("expiry_date").toString == "2019-01-04")
    assert(r.getAs[Int]("strike") == 3500)
    assert(r.getAs[String]("option_type") == "P")
  }
}
