package graft

import org.apache.spark.sql.functions._

/** The engine's tables are reachable through plain `spark.sql` — users of
  * the reference could run SQL against the same surface.
  */
class SqlSurfaceSpec extends SparkSpec {

  test("spark.sql over registered views matches the DataFrame operators") {
    Tables.registerViews(spark, "/root/testdata/sf0.001")
    val viaSql = spark.sql(
      """SELECT date_trunc('hour', `timestamp`) AS hour_ts, instrument_name,
        |  min_by(price, struct(`timestamp`, trade_id)) AS open_price,
        |  max(price) AS high_price
        |FROM trades GROUP BY 1, 2""".stripMargin)
    val viaDf = operators.Ohlc.hourlyOhlc(Tables.trades(spark, "/root/testdata/sf0.001"))
      .select(col("hour_ts"), col("instrument_name"), col("open_price"), col("high_price"))
    assert(viaSql.exceptAll(viaDf).isEmpty && viaDf.exceptAll(viaSql).isEmpty)
    assert(spark.sql("SELECT count(*) FROM lineitem").head().getLong(0) > 0)
    assert(spark.sql("SELECT count(*) FROM documents").head().getLong(0) > 0)
  }
}
