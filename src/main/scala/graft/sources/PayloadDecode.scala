package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType, StructType}

/** Per-exchange REST payload decode — the S1–S3 ingest shapes
  * ([[PagedTradeSource]] covers the cursor/pagination half; this file covers
  * what the rows LOOK like once fetched):
  *
  *  - Binance klines arrive as POSITIONAL JSON arrays
  *    (`/root/reference/src/pipeline/collectors/binance.py:93-97`):
  *    `[open_time_ms, "open", "high", "low", "close", "volume", ...]` —
  *    element 0 is a number, prices are strings.
  *  - Hyperliquid candleSnapshot rows are JSON DICTS with one-letter keys
  *    (`/root/reference/src/pipeline/collectors/hyperliquid.py:80,93`):
  *    `{"t": ms, "o": "...", "h": "...", "l": "...", "c": "..."}`.
  *
  * Decode is pure `from_json` + element access — map-side, codegen-friendly,
  * no UDF — and rows that fail to parse are DROPPED, mirroring the
  * reference's per-row try/except skip (`binance.py:108-117`,
  * `deribit.py:49-51`). At 100 TB the decode adds zero shuffles: it runs
  * inside the scan stage of whatever source produced the payload strings.
  *
  * The testdata has no raw-payload column, so [[syntheticKlinePayloads]] /
  * [[syntheticCandlePayloads]] derive deterministic payload strings from
  * `events` (the same testdata-derived-fixture pattern as
  * [[graft.Tables.optionTrades]]'s instrument names, including the 10%
  * malformed rows). Every component is integer-derived — float→string
  * rendering differs between engines, integer rendering does not — so the
  * DuckDB oracle builds bit-identical payloads.
  */
object PayloadDecode {

  /** Exact ms epoch of the event's minute (bar-open time): integral at the
    * minute boundary, so the double cast is exact in both engines.
    */
  private def minuteMs: Column =
    (date_trunc("MINUTE", col("ts")).cast("double") * 1000).cast("long")

  private def cents(c: Column): Column = lpad((c % 100).cast("string"), 2, "0")
  private def base: Column = col("user_id") % 900 + 100

  private def oStr: Column = concat(base, lit("."), cents(col("event_id")))
  private def hStr: Column = concat(base + 7, lit("."), cents(col("event_id")))
  private def lStr: Column = concat(base - 5, lit("."), cents(col("event_id")))
  private def cStr: Column = concat(base, lit("."), cents(col("event_id") + 37))
  private def vStr: Column = concat(col("user_id") % 50, lit("."), col("event_id") % 10)

  /** One Binance-shaped kline payload string per event; every 10th row is
    * truncated mid-array (the malformed-payload path).
    */
  def syntheticKlinePayloads(events: DataFrame): DataFrame =
    events.select(
      when(col("event_id") % 10 === 0, concat(lit("["), minuteMs))
        .otherwise(concat(
          lit("["), minuteMs,
          lit(",\""), oStr, lit("\",\""), hStr, lit("\",\""), lStr,
          lit("\",\""), cStr, lit("\",\""), vStr, lit("\"]")))
        .as("payload"))

  /** One Hyperliquid-shaped candleSnapshot dict per event; every 10th row is
    * truncated mid-object.
    */
  def syntheticCandlePayloads(events: DataFrame): DataFrame =
    events.select(
      when(col("event_id") % 10 === 0, concat(lit("{\"t\":"), minuteMs))
        .otherwise(concat(
          lit("{\"t\":"), minuteMs,
          lit(",\"o\":\""), oStr, lit("\",\"h\":\""), hStr,
          lit("\",\"l\":\""), lStr, lit("\",\"c\":\""), cStr, lit("\"}")))
        .as("payload"))

  /** Positional-array kline decode (S1/S2): `from_json` to `array<string>`
    * (JSON numbers coerce to their literal text, so one schema covers the
    * mixed number/string payload), then 1-based element access into the
    * typed OHLCV schema. Unparseable payloads → null array → dropped.
    */
  def decodeKlines(payloads: DataFrame, payloadCol: String = "payload"): DataFrame = {
    // explode(array(...)) is a PUSHDOWN BARRIER, not a transform: with a
    // plain withColumn stage, predicate pushdown inlines the null-drop
    // filter BELOW the staging projection, so from_json (and the whole
    // payload expression under it) evaluated twice per row — once in the
    // pushed Filter, once in the Project (the guide's duplicated-UDF
    // shape, §4.4, for a JVM expression). A Generate's output attribute
    // cannot be substituted below it, so the parse runs exactly once and
    // the filter tests the materialized column. explode(array(x)) always
    // emits exactly one row (array(null) contains one null element), so
    // row semantics are identical.
    val parsed = payloads
      .select(explode(array(
        from_json(col(payloadCol), ArrayType(StringType)))).as("__k"))
      .filter(col("__k").isNotNull)
    def f(i: Int) = element_at(col("__k"), i)
    parsed.select(
      timestamp_micros(f(1).cast("long") * 1000).as("open_time"),
      f(2).cast("double").as("open"),
      f(3).cast("double").as("high"),
      f(4).cast("double").as("low"),
      f(5).cast("double").as("close"),
      f(6).cast("double").as("volume"))
  }

  /** Dict candleSnapshot decode (S3): `from_json` against the one-letter-key
    * struct, fields renamed to the sink schema (`hyperliquid.py:93`:
    * datetime, open, high, low, close). Unparseable payloads → dropped.
    */
  def decodeCandleSnapshot(payloads: DataFrame, payloadCol: String = "payload"): DataFrame = {
    // same Generate barrier as decodeKlines: the two-conjunct null-drop
    // filter was pushed below the staging projection and re-evaluated
    // from_json TWICE more per row (measured in the formatted plan — the
    // Filter carried one full-schema and one t-pruned parse besides the
    // Project's own), tripling the per-row parse cost
    val parsed = payloads
      .select(explode(array(
        from_json(col(payloadCol),
          StructType.fromDDL("t BIGINT, o STRING, h STRING, l STRING, c STRING"))))
        .as("__c"))
      .filter(col("__c").isNotNull && col("__c.t").isNotNull)
    parsed.select(
      timestamp_micros(col("__c.t") * 1000).as("datetime"),
      col("__c.o").cast("double").as("open"),
      col("__c.h").cast("double").as("high"),
      col("__c.l").cast("double").as("low"),
      col("__c.c").cast("double").as("close"))
  }
}
