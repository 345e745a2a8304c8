package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TimeExprs

/** OHLC aggregation operators re-expressing the reference's trade→hourly and
  * session roll-up pipelines (SURVEY.md §2.4 A1/A2/A3/A4) as single-shuffle
  * Spark aggregations.
  *
  * Exact-parity convention for DuckDB oracles: additive aggregates are summed
  * as DECIMAL(38,6) (exact, association-independent) and cast back to DOUBLE;
  * min/max/first/last keep the original doubles (no arithmetic). Input values
  * are ≤2 decimal places, so the decimal cast is bit-stable across engines.
  */
object Ohlc {

  private val DEC = "decimal(38,6)"

  /** Exact double sum: per-row cast to decimal, exact add, back to double. */
  private def dsum(c: Column): Column = sum(c.cast(DEC)).cast("double")

  /** Trades → hourly OHLC (flagship A1, `aggregators/option_ohlc.py:58-93`).
    * One hash-aggregate over (hour, instrument); ordered open/close via
    * min_by/max_by on the unique (timestamp, trade_id) key instead of the
    * reference's ARRAY_AGG...[1] full-sort idiom.
    */
  def hourlyOhlc(trades: DataFrame): DataFrame = {
    val key = struct(col("timestamp"), col("trade_id"))
    val volume = dsum(col("amount"))
    trades
      .groupBy(
        date_trunc("HOUR", col("timestamp")).as("hour_ts"),
        col("instrument_name"))
      .agg(
        min_by(col("price"), key).as("open_price"),
        max(col("price")).as("high_price"),
        min(col("price")).as("low_price"),
        max_by(col("price"), key).as("close_price"),
        (dsum(col("price") * col("amount")) / nullif(volume, lit(0.0))).as("vwap"),
        volume.as("volume"),
        count(lit(1)).as("trade_count"),
        concat_ws(",",
          transform(
            array_sort(collect_list(struct(col("timestamp"), col("trade_id")))),
            x => x.getField("trade_id").cast("string"))).as("trade_ids"))
  }

  /** Trades → 1-minute OHLCV (the `{btc,eth,sol}_ohlc_1m` layer,
    * `collectors/binance_1m.py:121-135` — same shape as hourly plus volume,
    * at minute granularity). Same single-shuffle hash aggregate.
    */
  def minuteOhlc(trades: DataFrame): DataFrame = {
    val key = struct(col("timestamp"), col("trade_id"))
    trades
      .groupBy(
        date_trunc("MINUTE", col("timestamp")).as("minute_ts"),
        col("instrument_name"))
      .agg(
        min_by(col("price"), key).as("open"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        max_by(col("price"), key).as("close"),
        dsum(col("amount")).as("volume"),
        count(lit(1)).as("n_trades"))
  }

  /** Hourly OHLC restricted to the columns the session layer consumes
    * (`aggregators/daily_sessions.py:88-94`).
    */
  def hourlyBars(trades: DataFrame): DataFrame =
    hourlyOhlc(trades).select(
      col("hour_ts").as("t"),
      col("instrument_name").as("instrument"),
      col("open_price").as("open"),
      col("high_price").as("high"),
      col("low_price").as("low"),
      col("close_price").as("close"))

  /** Session OHLC roll-up (A2, `aggregators/base.py:87-153`): over time-ordered
    * rows per session — open=first open, close=last close, high/low with
    * FIRST-occurrence positional index (strict-inequality scan at
    * `base.py:110-121`), pct-changes 4dp half-even, chmax tie→chlow
    * (`base.py:126-131`), firstextremumtype tie→larger |ch| with HIGH on equal
    * (`base.py:133-138`). Sessions below `minRows` are dropped
    * (`daily_sessions.py:183-188` etc).
    *
    * Input columns: t, instrument, open, high, low, close. One window + one
    * hash-aggregate, both partitioned by (instrument, session) — a single
    * shuffle at scale.
    */
  def sessionRollup(bars: DataFrame, sessionStart: Column => Column, minRows: Int): DataFrame = {
    val withSession = bars.withColumn("session_start", sessionStart(col("t")))
    val w = Window.partitionBy(col("instrument"), col("session_start")).orderBy(col("t"))
    // long, not int: keeps output types identical to the DuckDB oracle's BIGINT
    val indexed = withSession.withColumn("rn", (row_number().over(w) - 1).cast("long"))

    val agged = indexed
      .groupBy(col("instrument"), col("session_start"))
      .agg(
        min_by(col("open"), col("t")).as("open"),
        max_by(col("close"), col("t")).as("close"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        // first occurrence of the extremum: minimize (−high, rn) / (low, rn)
        min_by(col("rn"), struct(-col("high"), col("rn"))).as("chhightime"),
        min_by(col("rn"), struct(col("low"), col("rn"))).as("chlowtime"),
        count(lit(1)).as("n_rows"))
      .filter(col("n_rows") >= minRows)

    val chhigh = TimeExprs.pctChange(col("open"), col("high"))
    val chlow = TimeExprs.pctChange(col("open"), col("low"))
    val chclose = TimeExprs.pctChange(col("open"), col("close"))
    agged
      .withColumn("move", col("high") - col("low"))
      .withColumn("chhigh", chhigh)
      .withColumn("chlow", chlow)
      .withColumn("chclose", chclose)
      .withColumn("chmax",
        when(abs(col("chhigh")) > abs(col("chlow")), col("chhigh")).otherwise(col("chlow")))
      .withColumn("firstextremumtype",
        when(col("chhightime") < col("chlowtime"), lit("HIGH"))
          .when(col("chlowtime") < col("chhightime"), lit("LOW"))
          .otherwise(when(abs(col("chhigh")) >= abs(col("chlow")), lit("HIGH")).otherwise(lit("LOW"))))
  }

  private def sessionCols(extra: Column*): Seq[Column] = Seq(
    col("session_start").as("datetime"), lit("events").as("source"), col("instrument"),
    col("open"), col("high"), col("low"), col("close"), col("move"),
    col("chhigh"), col("chlow"), col("chclose"), col("chmax"),
    col("chhightime"), col("chlowtime"), col("firstextremumtype")) ++ extra

  /** Daily sessions over hourly bars: [08:00, +24h) buckets, ≥20-row guard. */
  def dailySessions(bars: DataFrame): DataFrame =
    sessionRollup(bars, TimeExprs.dailySessionStart, minRows = 20)
      .select(sessionCols(lit(24L).as("session_hours")): _*)

  /** Daily-session rows recast as bars for the weekly/monthly layers
    * (`weekly_sessions.py:72-79`: consumes datetime..close of daily rows).
    */
  def dailyAsBars(daily: DataFrame): DataFrame =
    daily.select(col("datetime").as("t"), col("instrument"),
      col("open"), col("high"), col("low"), col("close"))

  /** Weekly sessions over daily sessions: Friday-anchored, ≥5-row guard. */
  def weeklySessions(daily: DataFrame): DataFrame =
    sessionRollup(dailyAsBars(daily), TimeExprs.weeklySessionStart, minRows = 5)
      .select(sessionCols(lit(168L).as("session_hours")): _*)

  /** Monthly sessions over daily sessions: last-Friday anchored non-uniform
    * windows, ≥20-row guard, plus counthours/countdays/session_end/year/month
    * (`monthly_sessions.py:152-177`).
    */
  def monthlySessions(daily: DataFrame): DataFrame = {
    val rolled = sessionRollup(dailyAsBars(daily), TimeExprs.monthlySessionStart, minRows = 20)
      .withColumn("session_end", TimeExprs.monthlySessionEnd(col("session_start")))
      .withColumn("counthours",
        ((unix_timestamp(col("session_end")) - unix_timestamp(col("session_start"))) / 3600)
          .cast("long"))
      .withColumn("countdays",
        ((unix_timestamp(col("session_end")) - unix_timestamp(col("session_start"))) / 86400)
          .cast("long"))
    rolled.select(sessionCols(
      col("counthours"), col("countdays"), col("session_end"),
      year(col("session_start")).cast("long").as("year"), month(col("session_start")).cast("long").as("month")): _*)
  }

  /** Top-2 extremums by |pct-change| per session (A3, `aggregators/base.py:48-85`):
    * per hourly row emit ch_high/ch_low candidates in the reference's append
    * order, keep the two with the largest |value| (stable by insertion order on
    * ties — mirrored by the (rn, seq) tiebreak).
    */
  def top2Extremums(bars: DataFrame, sessionStart: Column => Column): DataFrame = {
    val withSession = bars.withColumn("session_start", sessionStart(col("t")))
    val w = Window.partitionBy(col("instrument"), col("session_start")).orderBy(col("t"))
    val indexed = withSession
      .withColumn("rn", (row_number().over(w) - 1).cast("long"))
      .withColumn("chhigh", TimeExprs.pctChange(col("open"), col("high")))
      .withColumn("chlow", TimeExprs.pctChange(col("open"), col("low")))

    // Append order within a row (`base.py:71-79`): |ch_high|>|ch_low| → HIGH
    // first, else LOW (if nonzero) then HIGH; ch_low==0 rows emit only HIGH.
    // Candidates as one explode (a union of two projections would evaluate
    // the row_number window twice).
    val highFirst = abs(col("chhigh")) > abs(col("chlow"))
    val highCand = struct(col("chhigh").as("value"), lit("HIGH").as("type"),
      when(highFirst, lit(0L)).otherwise(lit(1L)).as("seq"))
    val lowCand = struct(col("chlow").as("value"), lit("LOW").as("type"),
      when(highFirst, lit(1L)).otherwise(lit(0L)).as("seq"))
    val cands = when(col("chlow") =!= 0, array(highCand, lowCand))
      .otherwise(array(highCand))

    // Python list.sort is stable: order by |value| desc, insertion order (rn, seq) asc.
    val rankW = Window.partitionBy(col("instrument"), col("session_start"))
      .orderBy(abs(col("value")).desc, col("rn"), col("seq"))
    indexed
      .select(col("instrument"), col("session_start"), col("rn"),
        explode(cands).as("cand"))
      .select(col("instrument"), col("session_start"), col("rn"),
        col("cand.value"), col("cand.type"), col("cand.seq"))
      .withColumn("rank", row_number().over(rankW).cast("long"))
      .filter(col("rank") <= 2)
      .select(col("instrument"), col("session_start"), col("rank"),
        col("value"), col("type"), col("rn").as("time"))
  }

  /** Stats aggregate (A4, `aggregators/option_ohlc.py:125-142`). */
  def stats(hourly: DataFrame): DataFrame =
    hourly.agg(
      count(lit(1)).as("total_records"),
      countDistinct(col("instrument_name")).as("unique_instruments"),
      max(col("hour_ts")).as("latest_hour"))
}
