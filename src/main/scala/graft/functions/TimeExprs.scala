package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Calendar/session-boundary expressions re-expressing the reference's Python
  * session logic as pure Catalyst column expressions (codegen-friendly, no
  * UDFs), per SURVEY.md §2.8.
  *
  * Reference semantics:
  *  - daily session  = [D 08:00 UTC, D+1 08:00 UTC)
  *    (`aggregators/daily_sessions.py:61-68`)
  *  - weekly session = Friday-anchored, [Fri 08:00 UTC, +7d)
  *    (`aggregators/weekly_sessions.py:51-66`)
  *  - monthly session = last-Friday-of-month 08:00 → last Friday of next month
  *    (`aggregators/monthly_sessions.py:51-95`), non-uniform length.
  */
object TimeExprs {

  /** Register `graft_utc_ts(ntz)` — a
    * [[org.apache.spark.sql.catalyst.expressions.Cast]] to TimestampType
    * with the zone EXPLICITLY pinned to UTC, so the wall-clock → instant
    * interpretation cannot follow the session time zone (the analyzer only
    * fills in a zone when the expression carries none). The same single
    * intrinsic op as a bare cast — a field-decomposition equivalent
    * measurably slowed every consumer that derives per-row values from the
    * timestamp. Idempotent per session, the [[TextExpressions.register]]
    * convention.
    */
  def registerUtcCast(spark: org.apache.spark.sql.SparkSession): Unit = {
    val name = org.apache.spark.sql.catalyst.FunctionIdentifier("graft_utc_ts")
    if (!spark.sessionState.functionRegistry.functionExists(name)) {
      spark.sessionState.functionRegistry.registerFunction(
        name,
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[org.apache.spark.sql.catalyst.expressions.Cast].getName,
          "graft_utc_ts"),
        (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          org.apache.spark.sql.catalyst.expressions.Cast(
            children.head, org.apache.spark.sql.types.TimestampType,
            Some("UTC")))
    }
  }

  private val H8 = expr("INTERVAL 8 HOURS")

  /** Start of the daily session containing `ts`: date_trunc(day, ts-8h)+8h. */
  def dailySessionStart(ts: Column): Column =
    (date_trunc("DAY", ts - H8) + H8).as("session_start")

  /** Start of the Friday-anchored weekly session containing `ts`.
    * weekday(): Monday=0 .. Sunday=6, Friday=4 — mirrors Python's
    * `(weekday - 4) % 7` at `weekly_sessions.py:60-62`.
    */
  def weeklySessionStart(ts: Column): Column = {
    val d = to_date(ts - H8) // date of the shifted instant; hour<8 rolls back a day
    val daysSinceFriday = pmod(weekday(d) - 4, lit(7))
    (date_sub(d, daysSinceFriday).cast("timestamp") + H8).as("session_start")
  }

  /** Last Friday of the month containing date `d`, at 08:00 UTC.
    * dayofweek(): Sunday=1 .. Saturday=7, Friday=6 → step back
    * (dayofweek(last_day)+1)%7 days (`monthly_sessions.py:51-64`).
    */
  def lastFridayOfMonth(d: Column): Column = {
    val ld = last_day(d)
    date_sub(ld, pmod(dayofweek(ld) + 1, lit(7))).cast("timestamp") + H8
  }

  /** Start of the monthly session containing `ts`: last Friday 08:00 of the
    * current month if ts has reached it, else of the previous month
    * (`monthly_sessions.py:76-82`).
    */
  def monthlySessionStart(ts: Column): Column = {
    val lfCur = lastFridayOfMonth(to_date(ts))
    val lfPrev = lastFridayOfMonth(date_sub(trunc(to_date(ts), "month"), 1))
    when(ts >= lfCur, lfCur).otherwise(lfPrev).as("session_start")
  }

  /** End of the monthly session starting at `sessionStart` = last Friday of
    * the following month (`monthly_sessions.py:84-95`).
    */
  def monthlySessionEnd(sessionStart: Column): Column =
    lastFridayOfMonth(add_months(to_date(sessionStart), 1))

  /** Percentage change vs open, 4dp half-even, 0 when open==0 — mirrors
    * `calculate_percentage_change` (`aggregators/base.py:31-46`, Python
    * `round` on Decimal = HALF_EVEN → Spark `bround`).
    */
  def pctChange(open: Column, target: Column): Column =
    when(open === 0, lit(0.0)).otherwise(bround((target - open) / open * 100, 4))
}
