package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full 24-column option OHLC aggregation — the reference's flagship SQL
  * statement (`aggregators/option_ohlc.py:49-123`) re-expressed as one
  * hash-aggregate: ordered null-filtered open/close for price / iv /
  * mark_price (P5 `FILTER (WHERE iv IS NOT NULL)` idiom), VWAP with
  * zero-volume NULLIF, ordered STRING_AGG of trade ids, hours-to-expiry with
  * the GREATEST(1, …) floor (P9), and the moneyness distance CASE (P8).
  *
  * Single shuffle on (hour, instrument); min_by/max_by replace the
  * reference's ARRAY_AGG(...)[1] full-sort idiom, and a null ordering key
  * makes min_by skip the row — the FILTER analog without a second pass.
  */
object Options {

  private val DEC = "decimal(38,6)"
  private def dsum(c: Column): Column = sum(c.cast(DEC)).cast("double")

  def hourlyOptionOhlc(trades: DataFrame): DataFrame = {
    val key = struct(col("timestamp"), col("trade_id"))
    // null ordering key → row ignored by min_by/max_by (FILTER analog)
    def keyIf(c: Column) = when(c.isNotNull, key)
    val volume = dsum(col("amount"))
    val hourTs = date_trunc("HOUR", col("timestamp"))

    val agged = trades
      .groupBy(hourTs.as("hour_timestamp"), col("instrument_name"),
        col("expiry_date"), col("strike"), col("option_type"))
      .agg(
        min_by(col("price"), key).as("open_price"),
        max(col("price")).as("high_price"),
        min(col("price")).as("low_price"),
        max_by(col("price"), key).as("close_price"),
        min_by(col("iv"), keyIf(col("iv"))).as("open_iv"),
        max(col("iv")).as("high_iv"),
        min(col("iv")).as("low_iv"),
        max_by(col("iv"), keyIf(col("iv"))).as("close_iv"),
        min_by(col("mark_price"), keyIf(col("mark_price"))).as("mark_price_open"),
        max(col("mark_price")).as("mark_price_high"),
        min(col("mark_price")).as("mark_price_low"),
        max_by(col("mark_price"), keyIf(col("mark_price"))).as("mark_price_close"),
        (dsum(col("price") * col("amount")) / nullif(volume, lit(0.0))).as("vwap"),
        volume.as("volume"),
        count(lit(1)).as("trade_count"),
        concat_ws(",",
          transform(
            array_sort(collect_list(struct(col("timestamp"), col("trade_id")))),
            x => x.getField("trade_id").cast("string"))).as("trade_ids"),
        min_by(col("index_price"), key).as("index_price"))

    // P9: expiry is 08:00 UTC on expiry_date; floor of 1 hour
    //     (`option_ohlc.py:80`). floor() on both engines — Spark's
    //     double→int cast truncates while DuckDB's rounds, so neither raw
    //     cast is portable.
    val expiryTs = col("expiry_date").cast("timestamp") + expr("INTERVAL 8 HOURS")
    val hte = greatest(lit(1L),
      floor((unix_timestamp(expiryTs) - unix_timestamp(col("hour_timestamp"))) / 3600)
        .cast("long"))
    // P8: moneyness distance vs first index price of the hour
    //     (`option_ohlc.py:82-90`), NULLIF guard on index==0.
    val idx = nullif(col("index_price"), lit(0.0))
    val distance = when(col("option_type") === "C",
        (idx - col("strike")) / idx * 100)
      .when(col("option_type") === "P",
        (col("strike") - idx) / idx * 100)

    agged
      .withColumn("hours_to_expiry", hte)
      .withColumn("distance", distance)
  }
}
