package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Completeness / maintenance operators (SURVEY.md §7 step 3): gap detection
  * via LAG (W1, `collectors/binance_1m.py:372-391`), gap summary (A5,
  * `binance_1m.py:510-535`), expected-timeline anti-join (J2,
  * `binance_1m.py:404-455`), upsert dedup semantics (D1-D3), watermark +
  * count scans (S6/S7), and the instrument-name parser (P6,
  * `collectors/deribit.py:29-51`).
  *
  * All inputs are the per-instrument minute grid derived from the trade
  * stream. Every window / aggregation is partitioned by instrument, so at
  * scale each series is processed independently (no single-partition global
  * window; the reference's single-series LAG generalizes per-symbol).
  */
object Maintenance {

  /** Distinct per-instrument minute grid: the `*_ohlc_1m` timeline stand-in. */
  def minuteGrid(events: DataFrame): DataFrame =
    events.select(
      col("event_type").as("instrument"),
      date_trunc("MINUTE", col("ts")).as("m"))
      .distinct()

  /** W1: gaps > `thresholdMin` minutes between consecutive present minutes.
    * LAG per instrument; missing_minutes = gap − 1 (`binance_1m.py:395-399`).
    */
  def gapDetect(events: DataFrame, thresholdMin: Int = 5): DataFrame = {
    val w = Window.partitionBy(col("instrument")).orderBy(col("m"))
    minuteGrid(events)
      .withColumn("gap_start", lag(col("m"), 1).over(w))
      .filter(col("gap_start").isNotNull)
      .withColumn("gap_minutes",
        ((unix_timestamp(col("m")) - unix_timestamp(col("gap_start"))) / 60).cast("long"))
      .filter(col("gap_minutes") > thresholdMin)
      .select(col("instrument"), col("gap_start"), col("m").as("gap_end"),
        col("gap_minutes"), (col("gap_minutes") - 1).as("missing_minutes"))
  }

  /** A5: per-instrument gap summary — ≥2-min gaps in the trailing 7 days of
    * the (global) max timestamp, their missing-minute total, and ≥60-min gaps
    * all-time. "now" is anchored to max(m) for determinism (SURVEY §7 "What's
    * hard" item 5).
    */
  def gapSummary(events: DataFrame): DataFrame = {
    val gaps = gapDetect(events, thresholdMin = 1)
    // scalar "now" via agg + broadcast cross join — a partitionBy() window
    // would funnel every gap row through ONE partition at scale
    val now = gaps.agg(max(col("gap_end")).as("now"))
    val anchored = gaps.crossJoin(broadcast(now))
    anchored
      .groupBy(col("instrument"))
      .agg(
        count(when(col("gap_end") > col("now") - expr("INTERVAL 7 DAYS"), 1))
          .as("n_gaps_7d"),
        coalesce(sum(when(col("gap_end") > col("now") - expr("INTERVAL 7 DAYS"),
          col("missing_minutes"))), lit(0L)).as("missing_minutes_7d"),
        count(when(col("gap_minutes") >= 60, 1)).as("n_large_gaps"))
  }

  /** J2: expected minute timeline per instrument (sequence+explode from min
    * to max present minute) anti-joined against present minutes → the exact
    * missing minutes a re-fetch would target (`binance_1m.py:404-455`).
    */
  def missingTimeline(events: DataFrame): DataFrame = {
    val grid = minuteGrid(events)
    // two-level explode (days, then 1440 minutes within each day) keeps every
    // generated array bounded — a single min→max minute sequence would build
    // one multi-million-element array row per instrument on years of data
    val expected = grid
      .groupBy(col("instrument"))
      .agg(min(col("m")).as("mn"), max(col("m")).as("mx"))
      .select(col("instrument"), col("mn"), col("mx"),
        explode(sequence(to_date(col("mn")), to_date(col("mx")),
          expr("INTERVAL 1 DAY"))).as("day"))
      .select(col("instrument"), col("mn"), col("mx"),
        explode(sequence(col("day").cast("timestamp"),
          col("day").cast("timestamp") + expr("INTERVAL 1439 MINUTES"),
          expr("INTERVAL 1 MINUTE"))).as("m"))
      .filter(col("m") >= col("mn") && col("m") <= col("mx"))
      .select(col("instrument"), col("m"))
    expected.join(grid, Seq("instrument", "m"), "left_anti")
      .select(col("instrument"), col("m").as("missing_minute"))
  }

  /** D3: last-write-wins upsert semantics — per (instrument, minute) key keep
    * the latest arrival (`ON CONFLICT DO UPDATE`, `collectors/binance.py:100-113`).
    * Arrival order = (ts, event_id); unique tiebreak makes it deterministic.
    */
  def dedupLastWriteWins(events: DataFrame): DataFrame = {
    val w = Window
      .partitionBy(col("event_type"), date_trunc("MINUTE", col("ts")))
      .orderBy(col("ts").desc, col("event_id").desc)
    events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_type").as("instrument"),
        date_trunc("MINUTE", col("ts")).as("m"),
        col("event_id"), col("value"))
  }

  /** D1/D2: first-wins dedup (`ON CONFLICT DO NOTHING`,
    * `collectors/deribit.py:128`; seen-set `collectors/hyperliquid.py:170-179`).
    */
  def dedupFirstWins(events: DataFrame): DataFrame = {
    val w = Window
      .partitionBy(col("event_type"), date_trunc("MINUTE", col("ts")))
      .orderBy(col("ts").asc, col("event_id").asc)
    events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_type").as("instrument"),
        date_trunc("MINUTE", col("ts")).as("m"),
        col("event_id"), col("value"))
  }

  /** S6+S7: per-instrument incremental watermark (MAX ts) + row count. */
  def watermark(events: DataFrame): DataFrame =
    events.groupBy(col("event_type").as("instrument"))
      .agg(max(col("ts")).as("watermark"), count(lit(1)).as("n_rows"))

  /** P6: parse `BTC-4JAN19-3500-P`-style names into (underlying, expiry_date,
    * strike, option_type); non-matching rows are dropped
    * (`collectors/deribit.py:29-51,90-92`). Pure codegen'd built-ins:
    * regexp_extract ×5 + month `when` chain + make_date.
    */
  val monthNumbers: Map[String, Int] = Map(
    "JAN" -> 1, "FEB" -> 2, "MAR" -> 3, "APR" -> 4, "MAY" -> 5, "JUN" -> 6,
    "JUL" -> 7, "AUG" -> 8, "SEP" -> 9, "OCT" -> 10, "NOV" -> 11, "DEC" -> 12)

  def parseInstrument(names: DataFrame): DataFrame = {
    val pat = "^(\\w+)-(\\d{1,2})([A-Z]{3})(\\d{2})-(\\d+)-([CP])$"
    // Month via a single map lookup, NOT a 12-branch when-chain: predicate
    // pushdown substitutes filter conditions below projections, and a chain
    // referencing the regex 12× would balloon the pushed condition past the
    // codegen method limit (interpreted fallback, no subexpression
    // elimination — observed 10× slowdown). try_element_at: ANSI element_at
    // throws on a missing key.
    val monthMap = typedLit(monthNumbers)
    def g(i: Int) = regexp_extract(col("instrument_name"), pat, i)
    // The parsed fields are staged behind an explode(array(struct(…)))
    // GENERATE BARRIER: the impossible-date filter references derived
    // columns, and predicate pushdown would otherwise inline their
    // definitions below the staging projection — the measured formatted
    // plan carried ~5 extra regexp_extract evaluations inside the pushed
    // Filter (plus the projection's own 6), and because the filter also
    // pushed below the caller's distinct(), the whole bundle ran once per
    // RAW row instead of once per distinct name. A Generate's output
    // attributes cannot be substituted below it, so the 6 extracts run
    // exactly once per name; the cheap rlike validity filter stays a plain
    // input-column predicate and still pushes below a caller's distinct.
    names
      .filter(col("instrument_name").rlike(pat))
      .select(col("instrument_name"),
        explode(array(struct(
          g(1).as("underlying"), g(2).cast("int").as("dd"),
          try_element_at(monthMap, g(3)).as("mm"),
          (g(4).cast("int") + 2000).as("yy"),
          g(5).cast("int").as("strike"), g(6).as("option_type")))).as("__p"))
      // impossible dates (31FEB…) → dropped, like the reference's None path
      // (`deribit.py:47-50`); ANSI make_date would otherwise throw.
      .filter(col("__p.mm").isNotNull &&
        col("__p.dd") <= dayofmonth(
          last_day(make_date(col("__p.yy"), col("__p.mm"), lit(1)))))
      .select(col("instrument_name"), col("__p.underlying").as("underlying"),
        make_date(col("__p.yy"), col("__p.mm"), col("__p.dd")).as("expiry_date"),
        col("__p.strike").as("strike"), col("__p.option_type").as("option_type"))
  }
}
