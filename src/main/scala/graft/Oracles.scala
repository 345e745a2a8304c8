package graft

/** DuckDB oracle SQL for SparkEntry.queries (driver contract: same column
  * names, same value semantics; see SURVEY.md §5 item 1).
  *
  * Parity conventions (mirrored in the Scala operators):
  *  - additive aggregates: SUM(CAST(x AS DECIMAL(38,6))) cast back to DOUBLE —
  *    exact arithmetic, association-independent, bit-identical across engines;
  *  - ordered first/last: DuckDB `first(x ORDER BY k…)` ↔ Spark
  *    `min_by(x, struct(k…))` with a unique key;
  *  - 4dp half-even rounding: DuckDB `round_even` ↔ Spark `bround`;
  *  - every integral output column is BIGINT on both sides.
  */
object Oracles {

  /** events recast as a trade stream — single source of truth is
    * [[Tables.tradesSql]] (kept in lockstep with Tables.trades).
    */
  val tradesCte: String = s"trades AS (\n${Tables.tradesSql})"

  /** A1 hourly OHLC over the trade stream. */
  val hourlyCte: String =
    """hourly AS (
      |  SELECT date_trunc('hour', "timestamp") AS hour_ts, instrument_name,
      |    first(price ORDER BY "timestamp", trade_id) AS open_price,
      |    max(price) AS high_price,
      |    min(price) AS low_price,
      |    last(price ORDER BY "timestamp", trade_id) AS close_price,
      |    CAST(sum(CAST(price * amount AS DECIMAL(38,6))) AS DOUBLE)
      |      / nullif(CAST(sum(CAST(amount AS DECIMAL(38,6))) AS DOUBLE), 0) AS vwap,
      |    CAST(sum(CAST(amount AS DECIMAL(38,6))) AS DOUBLE) AS volume,
      |    count(*) AS trade_count,
      |    string_agg(CAST(trade_id AS VARCHAR), ',' ORDER BY "timestamp", trade_id) AS trade_ids
      |  FROM trades GROUP BY 1, 2)""".stripMargin

  val barsCte: String =
    """bars AS (
      |  SELECT hour_ts AS t, instrument_name AS instrument, open_price AS "open",
      |         high_price AS high, low_price AS low, close_price AS "close"
      |  FROM hourly)""".stripMargin

  /** DuckDB session-start expressions over a timestamp column `t`.
    * dayofweek(): Sunday=0..Saturday=6, Friday=5 → step back (dow+2)%7 days.
    */
  val dailyStartExpr: String =
    "CAST(CAST(t - INTERVAL 8 HOURS AS DATE) AS TIMESTAMP) + INTERVAL 8 HOURS"

  val weeklyStartExpr: String =
    """CAST(CAST(t - INTERVAL 8 HOURS AS DATE)
      |  - CAST((dayofweek(CAST(t - INTERVAL 8 HOURS AS DATE)) + 2) % 7 AS INTEGER)
      |  AS TIMESTAMP) + INTERVAL 8 HOURS""".stripMargin

  /** last Friday 08:00 of the month containing date expression `d`. */
  private def lastFridaySql(d: String): String =
    s"""CAST(last_day($d) - CAST((dayofweek(last_day($d)) + 2) % 7 AS INTEGER)
       |  AS TIMESTAMP) + INTERVAL 8 HOURS""".stripMargin

  val monthlyStartExpr: String = {
    val lfCur = lastFridaySql("CAST(t AS DATE)")
    val lfPrev = lastFridaySql("CAST(date_trunc('month', CAST(t AS DATE)) AS DATE) - 1")
    s"CASE WHEN t >= ($lfCur) THEN ($lfCur) ELSE ($lfPrev) END"
  }

  /** A2 session roll-up over CTE `bars(t, instrument, open, high, low, close)`.
    * Produces CTE `sessions` with the full reference column set.
    */
  def sessionCtes(startExpr: String, minRows: Int, src: String = "bars",
                  p: String = ""): String =
    s"""${p}indexed AS (
       |  SELECT *, $startExpr AS session_start FROM $src),
       |${p}indexed2 AS (
       |  SELECT *, row_number() OVER (PARTITION BY instrument, session_start ORDER BY t) - 1 AS rn
       |  FROM ${p}indexed),
       |${p}agged AS (
       |  SELECT instrument, session_start,
       |    first("open" ORDER BY t) AS "open",
       |    last("close" ORDER BY t) AS "close",
       |    max(high) AS high, min(low) AS low,
       |    first(rn ORDER BY high DESC, rn) AS chhightime,
       |    first(rn ORDER BY low, rn) AS chlowtime,
       |    count(*) AS n_rows
       |  FROM ${p}indexed2 GROUP BY 1, 2
       |  HAVING count(*) >= $minRows),
       |${p}pct AS (
       |  SELECT *, high - low AS move,
       |    CASE WHEN "open" = 0 THEN 0.0 ELSE round_even((high - "open") / "open" * 100, 4) END AS chhigh,
       |    CASE WHEN "open" = 0 THEN 0.0 ELSE round_even((low - "open") / "open" * 100, 4) END AS chlow,
       |    CASE WHEN "open" = 0 THEN 0.0 ELSE round_even(("close" - "open") / "open" * 100, 4) END AS chclose
       |  FROM ${p}agged),
       |${p}sessions AS (
       |  SELECT session_start AS datetime, 'events' AS source, instrument,
       |    "open", high, low, "close", move, chhigh, chlow, chclose,
       |    CASE WHEN abs(chhigh) > abs(chlow) THEN chhigh ELSE chlow END AS chmax,
       |    chhightime, chlowtime,
       |    CASE WHEN chhightime < chlowtime THEN 'HIGH'
       |         WHEN chlowtime < chhightime THEN 'LOW'
       |         WHEN abs(chhigh) >= abs(chlow) THEN 'HIGH' ELSE 'LOW' END AS firstextremumtype
       |  FROM ${p}pct)""".stripMargin

  private val sessionOutCols =
    """datetime, source, instrument, "open", high, low, "close", move,
      |chhigh, chlow, chclose, chmax, chhightime, chlowtime, firstextremumtype""".stripMargin

  val hourlyOhlcSql: String =
    s"WITH $tradesCte,\n$hourlyCte\nSELECT * FROM hourly"

  val dailySessionsSql: String =
    s"""WITH $tradesCte,
       |$hourlyCte,
       |$barsCte,
       |${sessionCtes(dailyStartExpr, 20)}
       |SELECT $sessionOutCols, CAST(24 AS BIGINT) AS session_hours FROM sessions""".stripMargin

  /** Daily sessions re-exposed as bars for the weekly/monthly layers. */
  private val dailyToBarsCtes: String =
    s"""$tradesCte,
       |$hourlyCte,
       |$barsCte,
       |${sessionCtes(dailyStartExpr, 20)},
       |bars2 AS (
       |  SELECT datetime AS t, instrument, "open", high, low, "close" FROM sessions)""".stripMargin

  def weeklySessionsSql: String =
    s"""WITH $dailyToBarsCtes,
       |${sessionCtes(weeklyStartExpr, 5, src = "bars2", p = "w_")}
       |SELECT $sessionOutCols, CAST(168 AS BIGINT) AS session_hours FROM w_sessions""".stripMargin

  def monthlySessionsSql: String = {
    val lfNext = lastFridaySql("CAST(CAST(datetime AS DATE) + INTERVAL 1 MONTH AS DATE)")
    s"""WITH $dailyToBarsCtes,
       |${sessionCtes(monthlyStartExpr, 20, src = "bars2", p = "m_")},
       |ext AS (
       |  SELECT *, ($lfNext) AS session_end FROM m_sessions)
       |SELECT $sessionOutCols,
       |  CAST((epoch(session_end) - epoch(datetime)) / 3600 AS BIGINT) AS counthours,
       |  CAST((epoch(session_end) - epoch(datetime)) / 86400 AS BIGINT) AS countdays,
       |  session_end,
       |  CAST(year(datetime) AS BIGINT) AS year, CAST(month(datetime) AS BIGINT) AS month
       |FROM ext""".stripMargin
  }

  /** A3 top-2 extremums by |pct change| per daily session (no min-row guard —
    * `find_extremums` is guard-free in the reference).
    */
  val top2ExtremumsSql: String =
    s"""WITH $tradesCte,
       |$hourlyCte,
       |$barsCte,
       |indexed AS (
       |  SELECT *, $dailyStartExpr AS session_start FROM bars),
       |indexed2 AS (
       |  SELECT *, row_number() OVER (PARTITION BY instrument, session_start ORDER BY t) - 1 AS rn,
       |    CASE WHEN "open" = 0 THEN 0.0 ELSE round_even((high - "open") / "open" * 100, 4) END AS chhigh,
       |    CASE WHEN "open" = 0 THEN 0.0 ELSE round_even((low - "open") / "open" * 100, 4) END AS chlow
       |  FROM indexed),
       |expl AS (
       |  SELECT instrument, session_start, rn, chhigh AS value, 'HIGH' AS type,
       |    CASE WHEN abs(chhigh) > abs(chlow) THEN 0 ELSE 1 END AS seq
       |  FROM indexed2
       |  UNION ALL
       |  SELECT instrument, session_start, rn, chlow AS value, 'LOW' AS type,
       |    CASE WHEN abs(chhigh) > abs(chlow) THEN 1 ELSE 0 END AS seq
       |  FROM indexed2 WHERE chlow <> 0),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY instrument, session_start
       |                               ORDER BY abs(value) DESC, rn, seq) AS rank
       |  FROM expl)
       |SELECT instrument, session_start, rank, value, type, rn AS time
       |FROM ranked WHERE rank <= 2""".stripMargin

  /** S2: trades → 1-minute OHLCV. */
  val minuteOhlcSql: String =
    s"""WITH $tradesCte
       |SELECT date_trunc('minute', "timestamp") AS minute_ts, instrument_name,
       |  first(price ORDER BY "timestamp", trade_id) AS "open",
       |  max(price) AS high,
       |  min(price) AS low,
       |  last(price ORDER BY "timestamp", trade_id) AS "close",
       |  CAST(sum(CAST(amount AS DECIMAL(38,6))) AS DOUBLE) AS volume,
       |  count(*) AS n_trades
       |FROM trades GROUP BY 1, 2""".stripMargin

  /** As-of join: each trade ↔ latest hourly bar at or before it (DuckDB has
    * native ASOF JOIN — the Spark side composes it from a union + window).
    */
  val asofBarSql: String =
    s"""WITH $tradesCte,
       |$hourlyCte,
       |$barsCte
       |SELECT l.instrument_name AS instrument, l."timestamp", l.trade_id, l.price,
       |  r.t AS asof_t, r."open" AS asof_open, r."close" AS asof_close
       |FROM trades l ASOF LEFT JOIN bars r
       |  ON l.instrument_name = r.instrument AND l."timestamp" >= r.t""".stripMargin

  /** A4 stats over the hourly layer. */
  val statsSql: String =
    s"""WITH $tradesCte,
       |$hourlyCte
       |SELECT count(*) AS total_records,
       |  count(DISTINCT instrument_name) AS unique_instruments,
       |  max(hour_ts) AS latest_hour
       |FROM hourly""".stripMargin

  // ---- relational (star schema) ----

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  val filterProjectSql: String =
    """SELECT event_id, ts, user_id, value FROM events
      |WHERE event_type = 'purchase' AND value > 100""".stripMargin

  val revenueByNationSql: String =
    """SELECT r_name, n_name,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name""".stripMargin

  val ordersByPrioritySql: String =
    """SELECT o_orderpriority, date_trunc('month', o_orderdate) AS order_month,
      |  count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price,
      |  count(DISTINCT o_custkey) AS n_customers
      |FROM orders GROUP BY 1, 2""".stripMargin

  val topCustomersSql: String =
    """SELECT c_custkey, c_name, revenue, n_orders FROM (
      |  SELECT o_custkey,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
      |    count(*) AS n_orders
      |  FROM orders GROUP BY o_custkey) agg
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY revenue DESC, c_custkey LIMIT 10""".stripMargin

  /** Mirrors IntervalJoin.campaignWindowStats: the declarative range join —
    * DuckDB plans this with its IEJoin; the Spark side states the same
    * semantics through the bin-replication equi-join.
    */
  val intervalJoinSql: String =
    """WITH c AS (SELECT DISTINCT CAST(date_trunc('month', o_orderdate) AS DATE)
      |  AS campaign_start FROM orders)
      |SELECT campaign_start,
      |  count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
      |FROM c JOIN orders
      |  ON CAST(o_orderdate AS DATE) >= campaign_start
      | AND CAST(o_orderdate AS DATE) < campaign_start + 10
      |GROUP BY 1""".stripMargin

  val runningOrderTotalSql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(38,6)))
      |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
      |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq
      |FROM orders""".stripMargin

  // ---- maintenance / completeness (SURVEY §7 step 3) ----

  /** Per-instrument distinct minute grid (the `*_ohlc_1m` timeline stand-in). */
  val minutesCte: String =
    """minutes AS (
      |  SELECT DISTINCT event_type AS instrument, date_trunc('minute', ts) AS m
      |  FROM events)""".stripMargin

  private def gapsCte(threshold: Int): String =
    s"""lagged AS (
       |  SELECT instrument, m, lag(m) OVER (PARTITION BY instrument ORDER BY m) AS prev_m
       |  FROM minutes),
       |gaps AS (
       |  SELECT instrument, prev_m AS gap_start, m AS gap_end,
       |    CAST((epoch(m) - epoch(prev_m)) / 60 AS BIGINT) AS gap_minutes
       |  FROM lagged
       |  WHERE prev_m IS NOT NULL AND (epoch(m) - epoch(prev_m)) / 60 > $threshold)""".stripMargin

  val gapDetectSql: String =
    s"""WITH $minutesCte,
       |${gapsCte(5)}
       |SELECT instrument, gap_start, gap_end, gap_minutes,
       |  gap_minutes - 1 AS missing_minutes
       |FROM gaps""".stripMargin

  val gapSummarySql: String =
    s"""WITH $minutesCte,
       |${gapsCte(1)},
       |anch AS (
       |  SELECT *, max(gap_end) OVER () AS now, gap_minutes - 1 AS missing_minutes
       |  FROM gaps)
       |SELECT instrument,
       |  count(*) FILTER (WHERE gap_end > now - INTERVAL 7 DAYS) AS n_gaps_7d,
       |  CAST(coalesce(sum(missing_minutes) FILTER (WHERE gap_end > now - INTERVAL 7 DAYS), 0) AS BIGINT) AS missing_minutes_7d,
       |  count(*) FILTER (WHERE gap_minutes >= 60) AS n_large_gaps
       |FROM anch GROUP BY 1""".stripMargin

  val missingTimelineSql: String =
    s"""WITH $minutesCte,
       |bounds AS (
       |  SELECT instrument, min(m) AS mn, max(m) AS mx FROM minutes GROUP BY 1),
       |expected AS (
       |  SELECT instrument, unnest(generate_series(mn, mx, INTERVAL 1 MINUTE)) AS m
       |  FROM bounds)
       |SELECT e.instrument, e.m AS missing_minute
       |FROM expected e LEFT JOIN minutes p
       |  ON e.instrument = p.instrument AND e.m = p.m
       |WHERE p.m IS NULL""".stripMargin

  val dedupLastWriteWinsSql: String =
    """SELECT instrument, m, event_id, value FROM (
      |  SELECT event_type AS instrument, date_trunc('minute', ts) AS m,
      |    event_id, value,
      |    row_number() OVER (PARTITION BY event_type, date_trunc('minute', ts)
      |                       ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) t WHERE rn = 1""".stripMargin

  val dedupFirstWinsSql: String =
    """SELECT instrument, m, event_id, value FROM (
      |  SELECT event_type AS instrument, date_trunc('minute', ts) AS m,
      |    event_id, value,
      |    row_number() OVER (PARTITION BY event_type, date_trunc('minute', ts)
      |                       ORDER BY ts ASC, event_id ASC) AS rn
      |  FROM events) t WHERE rn = 1""".stripMargin

  val watermarkSql: String =
    """SELECT event_type AS instrument, max(ts) AS watermark, count(*) AS n_rows
      |FROM events GROUP BY 1""".stripMargin

  // ---- synthesized option-trade stream (Tables.optionTrades) ----

  // NB: no CTE line may have content starting with `|` (e.g. a leading `||`
  // concat) — CTEs are interpolated into outer stripMargin strings and get
  // re-stripped, which would eat one pipe.
  val optionTradesCte: String =
    """otrades AS (
      |  SELECT event_id AS trade_id, ts AS "timestamp",
      |    CASE WHEN event_id % 10 = 0 THEN 'MALFORMED-' || event_id
      |         ELSE 'BTC-' || upper(strftime(CAST(ts AS DATE) + CAST(user_id % 30 + 1 AS INT), '%-d%b%y')) ||
      |              '-' || CAST(user_id % 20 * 500 + 10000 AS INT) ||
      |              '-' || (CASE WHEN event_id % 2 = 0 THEN 'C' ELSE 'P' END)
      |    END AS instrument_name,
      |    CAST(ts AS DATE) + CAST(user_id % 30 + 1 AS INT) AS expiry_date,
      |    CAST(user_id % 20 * 500 + 10000 AS INT) AS strike,
      |    CASE WHEN event_id % 2 = 0 THEN 'C' ELSE 'P' END AS option_type,
      |    value AS price,
      |    CAST(user_id % 7 + 1 AS DOUBLE) AS amount,
      |    CASE WHEN event_id % 5 = 0 THEN NULL ELSE value / 2 END AS iv,
      |    CASE WHEN event_id % 7 = 0 THEN NULL ELSE value * 1.01 END AS mark_price,
      |    value * 10 + 5 AS index_price
      |  FROM events)""".stripMargin

  private val parsePat = """^(\w+)-(\d{1,2})([A-Z]{3})(\d{2})-(\d+)-([CP])$"""

  val parseInstrumentSql: String = {
    // TRY_CAST: DuckDB does not short-circuit AND conjuncts, so the day/year
    // casts can be evaluated on rows regexp_matches rejects ('' extracts).
    def g(i: Int) = s"regexp_extract(instrument_name, '$parsePat', $i)"
    val month = "CASE " + Seq("JAN", "FEB", "MAR", "APR", "MAY", "JUN", "JUL",
      "AUG", "SEP", "OCT", "NOV", "DEC").zipWithIndex
      .map { case (m, i) => s"WHEN ${g(3)} = '$m' THEN ${i + 1}" }
      .mkString(" ") + " END"
    s"""WITH $optionTradesCte,
       |names AS (SELECT DISTINCT instrument_name FROM otrades)
       |SELECT instrument_name,
       |  ${g(1)} AS underlying,
       |  make_date(2000 + TRY_CAST(${g(4)} AS INT), $month, TRY_CAST(${g(2)} AS INT)) AS expiry_date,
       |  TRY_CAST(${g(5)} AS INT) AS strike,
       |  ${g(6)} AS option_type
       |FROM names
       |WHERE regexp_matches(instrument_name, '$parsePat')
       |  AND TRY_CAST(${g(2)} AS INT) <=
       |      day(last_day(make_date(2000 + TRY_CAST(${g(4)} AS INT), $month, 1)))""".stripMargin
  }

  /** Full 24-column option OHLC (`aggregators/option_ohlc.py:49-123`). */
  val optionOhlcFullSql: String = {
    val key = """"timestamp", trade_id"""
    s"""WITH $optionTradesCte,
       |ohlc AS (
       |  SELECT date_trunc('hour', "timestamp") AS hour_timestamp,
       |    instrument_name, expiry_date, strike, option_type,
       |    first(price ORDER BY $key) AS open_price,
       |    max(price) AS high_price,
       |    min(price) AS low_price,
       |    last(price ORDER BY $key) AS close_price,
       |    first(iv ORDER BY $key) FILTER (WHERE iv IS NOT NULL) AS open_iv,
       |    max(iv) AS high_iv,
       |    min(iv) AS low_iv,
       |    last(iv ORDER BY $key) FILTER (WHERE iv IS NOT NULL) AS close_iv,
       |    first(mark_price ORDER BY $key) FILTER (WHERE mark_price IS NOT NULL) AS mark_price_open,
       |    max(mark_price) AS mark_price_high,
       |    min(mark_price) AS mark_price_low,
       |    last(mark_price ORDER BY $key) FILTER (WHERE mark_price IS NOT NULL) AS mark_price_close,
       |    CAST(sum(CAST(price * amount AS DECIMAL(38,6))) AS DOUBLE)
       |      / nullif(CAST(sum(CAST(amount AS DECIMAL(38,6))) AS DOUBLE), 0) AS vwap,
       |    CAST(sum(CAST(amount AS DECIMAL(38,6))) AS DOUBLE) AS volume,
       |    count(*) AS trade_count,
       |    string_agg(CAST(trade_id AS VARCHAR), ',' ORDER BY $key) AS trade_ids,
       |    first(index_price ORDER BY $key) AS index_price
       |  FROM otrades GROUP BY 1, 2, 3, 4, 5)
       |SELECT *,
       |  greatest(CAST(1 AS BIGINT),
       |    CAST(floor((epoch(CAST(expiry_date AS TIMESTAMP) + INTERVAL 8 HOURS)
       |                - epoch(hour_timestamp)) / 3600) AS BIGINT)) AS hours_to_expiry,
       |  CASE WHEN option_type = 'C'
       |         THEN (nullif(index_price, 0) - strike) / nullif(index_price, 0) * 100
       |       WHEN option_type = 'P'
       |         THEN (strike - nullif(index_price, 0)) / nullif(index_price, 0) * 100
       |  END AS distance
       |FROM ohlc""".stripMargin
  }

  /** Shared payload-derivation CTE mirroring
    * [[graft.sources.PayloadDecode]]'s synthetic fixtures: every component
    * is integer-derived (float→string rendering differs between engines),
    * the minute-truncated ms epoch is integral so the double math is exact,
    * and every 10th payload is truncated mid-token.
    */
  private val payloadParts: String =
    """parts AS (
      |  SELECT event_id,
      |    CAST(CAST(epoch(date_trunc('minute', ts)) * 1000 AS BIGINT) AS VARCHAR) AS ms,
      |    CAST(user_id % 900 + 100 AS VARCHAR) || '.' ||
      |      lpad(CAST(event_id % 100 AS VARCHAR), 2, '0') AS o,
      |    CAST(user_id % 900 + 107 AS VARCHAR) || '.' ||
      |      lpad(CAST(event_id % 100 AS VARCHAR), 2, '0') AS h,
      |    CAST(user_id % 900 + 95 AS VARCHAR) || '.' ||
      |      lpad(CAST(event_id % 100 AS VARCHAR), 2, '0') AS l,
      |    CAST(user_id % 900 + 100 AS VARCHAR) || '.' ||
      |      lpad(CAST((event_id + 37) % 100 AS VARCHAR), 2, '0') AS c,
      |    CAST(user_id % 50 AS VARCHAR) || '.' ||
      |      CAST(event_id % 10 AS VARCHAR) AS v
      |  FROM events)""".stripMargin

  val parseKlinesSql: String =
    s"""WITH $payloadParts,
       |payloads AS (
       |  SELECT CASE WHEN event_id % 10 = 0 THEN '[' || ms
       |         ELSE '[' || ms || ',"' || o || '","' || h || '","' || l
       |              || '","' || c || '","' || v || '"]' END AS payload
       |  FROM parts)
       |SELECT
       |  epoch_ms(CAST(json_extract_string(payload, '$$[0]') AS BIGINT)) AS open_time,
       |  CAST(json_extract_string(payload, '$$[1]') AS DOUBLE) AS "open",
       |  CAST(json_extract_string(payload, '$$[2]') AS DOUBLE) AS high,
       |  CAST(json_extract_string(payload, '$$[3]') AS DOUBLE) AS low,
       |  CAST(json_extract_string(payload, '$$[4]') AS DOUBLE) AS "close",
       |  CAST(json_extract_string(payload, '$$[5]') AS DOUBLE) AS volume
       |FROM payloads WHERE json_valid(payload)""".stripMargin

  val parseCandlesSql: String =
    s"""WITH $payloadParts,
       |payloads AS (
       |  SELECT CASE WHEN event_id % 10 = 0 THEN '{"t":' || ms
       |         ELSE '{"t":' || ms || ',"o":"' || o || '","h":"' || h
       |              || '","l":"' || l || '","c":"' || c || '"}' END AS payload
       |  FROM parts)
       |SELECT
       |  epoch_ms(CAST(json_extract_string(payload, '$$.t') AS BIGINT)) AS datetime,
       |  CAST(json_extract_string(payload, '$$.o') AS DOUBLE) AS "open",
       |  CAST(json_extract_string(payload, '$$.h') AS DOUBLE) AS high,
       |  CAST(json_extract_string(payload, '$$.l') AS DOUBLE) AS low,
       |  CAST(json_extract_string(payload, '$$.c') AS DOUBLE) AS "close"
       |FROM payloads WHERE json_valid(payload)""".stripMargin

  val setOpsSql: String =
    """WITH rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 8000),
      |active AS (SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O')
      |SELECT c_custkey, 'both' AS set_kind FROM (SELECT * FROM rich INTERSECT SELECT * FROM active)
      |UNION ALL
      |SELECT c_custkey, 'rich_only' AS set_kind FROM (SELECT * FROM rich EXCEPT SELECT * FROM active)""".stripMargin
}
