package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's synthetic parquet tables (TESTDATA.md) plus the
  * derived "trade stream" view used by the OHLC/session operators.
  *
  * Role mapping (FIXTURES.md §A): `events` stands in for the reference's trade
  * stream (`/root/reference/src/pipeline/collectors/deribit.py:120-131`):
  * ts→timestamp, value→price, derived amount→amount, event_type→instrument,
  * event_id→trade_id.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The driver testdata stores events.ts as parquet TIMESTAMP(NANOS), which
    // Spark rejects by default; read it as a long and convert below. Session
    // conf, so it works under any driver-created SparkSession.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** events with `ts` normalized to TimestampType (µs). The ns→µs truncation
    * (floor) matches what DuckDB does when it reads the same parquet.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer `div`, not `/`: ns-epoch values (~1.7e18) don't fit a double
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** events recast as an option-trade-like stream. `amount` is a deterministic
    * positive function of user_id (the testdata has no native quantity column).
    */
  def trades(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).select(
      col("event_id").as("trade_id"),
      col("ts").as("timestamp"),
      col("event_type").as("instrument_name"),
      col("value").as("price"),
      (col("user_id") % 7 + 1).cast("double").as("amount")
    )

  /** Same derivation as SQL text, for oracle CTEs. */
  val tradesSql: String =
    """SELECT event_id AS trade_id, ts AS "timestamp", event_type AS instrument_name,
      |       value AS price, CAST(user_id % 7 + 1 AS DOUBLE) AS amount
      |FROM events""".stripMargin
}
