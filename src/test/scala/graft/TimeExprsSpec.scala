package graft

import org.apache.spark.sql.functions._

import graft.functions.TimeExprs

/** Session-boundary semantics (SURVEY §5 item 2): daily 08:00 offset, weekly
  * Friday anchor, monthly last-Friday incl. Dec→Jan rollover and a month
  * ending on a Friday, pct-change rounding/zero-guard.
  */
class TimeExprsSpec extends SparkSpec {
  import spark.implicits._

  private def sessStart(ts: String, f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): String =
    Seq(ts).toDF("s")
      .select(f(col("s").cast("timestamp")).cast("string")).as[String].head()

  test("daily session start: hour >= 8 stays, hour < 8 rolls back") {
    assert(sessStart("2024-03-10 08:00:00", TimeExprs.dailySessionStart) == "2024-03-10 08:00:00")
    assert(sessStart("2024-03-10 23:30:00", TimeExprs.dailySessionStart) == "2024-03-10 08:00:00")
    assert(sessStart("2024-03-10 07:59:59", TimeExprs.dailySessionStart) == "2024-03-09 08:00:00")
  }

  test("weekly session start anchors to Friday 08:00") {
    // 2024-03-10 is a Sunday → session began Friday 2024-03-08 08:00
    assert(sessStart("2024-03-10 12:00:00", TimeExprs.weeklySessionStart) == "2024-03-08 08:00:00")
    // Friday before 08:00 belongs to the prior week
    assert(sessStart("2024-03-08 07:00:00", TimeExprs.weeklySessionStart) == "2024-03-01 08:00:00")
    assert(sessStart("2024-03-08 08:00:00", TimeExprs.weeklySessionStart) == "2024-03-08 08:00:00")
  }

  test("monthly session start: last Friday, incl. Dec→Jan rollover") {
    // last Friday of Jan 2024 = Jan 26
    assert(sessStart("2024-01-27 12:00:00", TimeExprs.monthlySessionStart) == "2024-01-26 08:00:00")
    // before it → December's last Friday (Dec 29, 2023)
    assert(sessStart("2024-01-10 12:00:00", TimeExprs.monthlySessionStart) == "2023-12-29 08:00:00")
    // month whose last day IS a Friday: May 31 2024
    assert(sessStart("2024-05-31 09:00:00", TimeExprs.monthlySessionStart) == "2024-05-31 08:00:00")
    assert(sessStart("2024-05-31 07:00:00", TimeExprs.monthlySessionStart) == "2024-04-26 08:00:00")
  }

  test("monthly session end is the next month's last Friday") {
    val end = Seq("2023-12-29 08:00:00").toDF("s")
      .select(TimeExprs.monthlySessionEnd(col("s").cast("timestamp")).cast("string"))
      .as[String].head()
    assert(end == "2024-01-26 08:00:00")
  }

  test("pct change: half-even 4dp, zero-open guard") {
    val df = Seq((100.0, 100.000025), (0.0, 5.0), (100.0, 99.999975))
      .toDF("open", "target")
      .select(TimeExprs.pctChange(col("open"), col("target")).as("ch"))
    // 0.000025 * 100 / 100 → 0.000025% → bround(…, 4) = 0.0 (half-even to even)
    val rows = df.as[Double].collect()
    assert(rows(0) == 0.0)
    assert(rows(1) == 0.0) // zero open → 0
    assert(rows(2) == -0.0 || rows(2) == 0.0)
  }
}
