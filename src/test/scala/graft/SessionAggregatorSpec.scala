package graft

import org.apache.spark.sql.functions._

import graft.functions.TimeExprs
import graft.operators.{Ohlc, SessionAggregator}

/** The typed single-pass kernel must agree with the window+min_by encoding
  * on real data (both replay `aggregators/base.py:87-153`).
  */
class SessionAggregatorSpec extends SparkSpec {

  test("typed aggregator == window encoding on sf0.001 daily sessions") {
    val bars = Ohlc.hourlyBars(Tables.trades(spark, "/root/testdata/sf0.001"))
    val cols = Seq("instrument", "session_start", "open", "high", "low", "close",
      "move", "chhigh", "chlow", "chclose", "chmax",
      "chhightime", "chlowtime", "firstextremumtype", "n_rows")
    val viaWindow = Ohlc.sessionRollup(bars, TimeExprs.dailySessionStart, minRows = 1)
      .select(cols.map(col): _*)
    val viaTyped = SessionAggregator.sessionRollupTyped(bars, TimeExprs.dailySessionStart, minRows = 1)
      .select(cols.map(col): _*)
    assert(viaWindow.exceptAll(viaTyped).isEmpty && viaTyped.exceptAll(viaWindow).isEmpty)
    assert(viaTyped.count() > 0)
  }
}
