package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.TimeExprs
import graft.operators.Ohlc

/** A2 session roll-up semantics against hand-built fixtures (FIXTURES.md B1):
  * first-occurrence argmax (strict `>` scan at `aggregators/base.py:110-121`),
  * firstextremumtype tie rule (`base.py:133-138`), chmax sign rule
  * (`base.py:126-131`), min-row guard (`daily_sessions.py:183-188`).
  */
class SessionRollupSpec extends SparkSpec {
  import spark.implicits._

  /** 24 hourly bars in one daily session [D 08:00, D+1 08:00). */
  private def bars(highs: Seq[Double], lows: Seq[Double],
                   opens: Seq[Double] = null, closes: Seq[Double] = null) = {
    val n = highs.length
    val o = Option(opens).getOrElse(Seq.fill(n)(100.0))
    val c = Option(closes).getOrElse(Seq.fill(n)(100.0))
    // minute offsets keep all rows inside one daily session for any n < 60
    (0 until n).map { i =>
      (sqlTs(f"2024-03-10 08:$i%02d:00"), "X", o(i), highs(i), lows(i), c(i))
    }.toDF("t", "instrument", "open", "high", "low", "close")
  }

  private def roll(df: org.apache.spark.sql.DataFrame, minRows: Int = 1) =
    Ohlc.sessionRollup(df, TimeExprs.dailySessionStart, minRows).collect()

  test("first-occurrence argmax: duplicate max-high keeps the FIRST index") {
    val highs = Seq(100.0, 110.0, 105.0, 110.0, 100.0) // max at idx 1 and 3
    val lows = Seq(90.0, 95.0, 80.0, 80.0, 85.0) // min at idx 2 and 3
    val r = roll(bars(highs, lows)).head
    assert(r.getAs[Long]("chhightime") == 1L)
    assert(r.getAs[Long]("chlowtime") == 2L)
    assert(r.getAs[String]("firstextremumtype") == "HIGH")
  }

  test("firstextremumtype tie (same hour): larger |ch| wins, HIGH on equal") {
    // extremes both at idx 0; |chhigh| = 10%, |chlow| = 20% → LOW
    val r1 = roll(bars(Seq(110.0, 105.0), Seq(80.0, 90.0))).head
    assert(r1.getAs[Long]("chhightime") == 0L)
    assert(r1.getAs[Long]("chlowtime") == 0L)
    assert(r1.getAs[String]("firstextremumtype") == "LOW")
    // equal |ch| → HIGH (the >= in the tie rule)
    val r2 = roll(bars(Seq(110.0, 105.0), Seq(90.0, 95.0))).head
    assert(r2.getAs[String]("firstextremumtype") == "HIGH")
  }

  test("chmax takes chlow on equal magnitude (strict > for chhigh)") {
    val r = roll(bars(Seq(110.0, 100.0), Seq(90.0, 95.0))).head
    assert(r.getAs[Double]("chmax") == r.getAs[Double]("chlow"))
  }

  test("open/close come from first/last bar by time") {
    val df = bars(Seq(101.0, 102.0, 103.0), Seq(99.0, 98.0, 97.0),
      opens = Seq(100.5, 101.5, 102.5), closes = Seq(101.0, 102.0, 102.9))
    val r = roll(df).head
    assert(r.getAs[Double]("open") == 100.5)
    assert(r.getAs[Double]("close") == 102.9)
  }

  test("sessions below minRows are dropped") {
    val df = bars(Seq.fill(19)(100.0), Seq.fill(19)(100.0))
    assert(roll(df, minRows = 20).isEmpty)
    assert(roll(df, minRows = 19).nonEmpty)
  }

  test("zero open → pct changes are 0 (no division error under ANSI)") {
    val df = bars(Seq(10.0, 11.0), Seq(5.0, 6.0), opens = Seq(0.0, 1.0))
    val r = roll(df).head
    assert(r.getAs[Double]("chhigh") == 0.0)
    assert(r.getAs[Double]("chclose") == 0.0)
  }
}
