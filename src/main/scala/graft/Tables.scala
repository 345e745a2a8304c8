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
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // The testdata files are single-row-group parquet → 1 scan partition →
    // every downstream map-side expression runs single-threaded. Spread
    // under-split scans across the cluster; on real multi-split inputs
    // (100 TB = thousands of row groups) this never triggers, so no extra
    // shuffle is paid at scale.
    val target = spark.sparkContext.defaultParallelism
    if (estimatedScanSplits(spark, df) < target / 2) df.repartition(target) else df
  }

  /** Scan parallelism from file metadata alone — `df.rdd.getNumPartitions`
    * would materialize the RDD lineage per table per query (measured fixed
    * per-query overhead at bench scale). Follows FilePartition's bin-packing
    * arithmetic: each file contributes max(len, openCostInBytes) padded
    * bytes, and the total is divided by the max partition size — so many
    * tiny files correctly estimate FEW scan partitions (per-file ceil would
    * over-count them and wrongly skip the scan-spread repartition).
    * DELIBERATELY omits Spark's bytesPerCore clamp (maxSplitBytes =
    * min(maxPartitionBytes, max(openCost, totalBytes/parallelism))): the
    * clamp counts byte-range splits, but a split only carries data when a
    * row-group midpoint falls inside it — on few-row-group files (exactly
    * the under-split inputs this guard exists for) the clamped figure
    * overstates effective parallelism and would wrongly skip the spread.
    * The unclamped estimate is the conservative lower bound on real
    * parallelism, which is the quantity the trigger needs.
    */
  private def estimatedScanSplits(spark: SparkSession, df: DataFrame): Long = {
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    val openCost = spark.sessionState.conf.filesOpenCostInBytes
    val hconf = spark.sparkContext.hadoopConfiguration
    val padded = df.inputFiles.map { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      math.max(path.getFileSystem(hconf).getFileStatus(path).getLen, openCost)
    }.sum
    math.max(1L, (padded + maxSplit - 1) / maxSplit)
  }

  private def loadValidated(spark: SparkSession, dir: String, name: String): DataFrame =
    Schemas.validate(name, load(spark, dir, name))

  /** events with `ts` normalized to TimestampType (µs). The ns→µs truncation
    * (floor) matches what DuckDB does when it reads the same parquet.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    val normalized = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer `div`, not `/`: ns-epoch values (~1.7e18) don't fit a double
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        // parquet timestamp[us] (no tz) reads as TIMESTAMP_NTZ; the stored
        // wall-clock is UTC. A bare cast("timestamp") would interpret it in
        // the SESSION time zone — silently hours off in any non-UTC session
        // (Tables is a public entry point; nothing pins consumers to UTC) —
        // so the conversion is a Catalyst Cast PINNED to UTC: the same
        // single intrinsic op as the plain cast (ts feeds per-row derivation
        // in optionTrades; a field-decomposition rewrite here measurably
        // slowed the parse queries), exact for every instant (UTC has no
        // DST ambiguity), independent of the consumer session's zone.
        functions.TimeExprs.registerUtcCast(spark)
        raw.withColumn("ts", call_function("graft_utc_ts", col("ts")))
      case _ => raw
    }
    Schemas.validate("events", normalized)
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = loadValidated(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = loadValidated(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = loadValidated(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = loadValidated(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = loadValidated(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = loadValidated(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = loadValidated(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = loadValidated(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = loadValidated(spark, dir, "embeddings")

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

  /** Register every testdata table (plus the derived trades view) as temp
    * views so the engine's full surface is reachable from `spark.sql`.
    */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    Schemas.all.keys.foreach { name =>
      loadOrEvents(spark, dir, name).createOrReplaceTempView(name)
    }
    trades(spark, dir).createOrReplaceTempView("trades")
  }

  private def loadOrEvents(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir) else loadValidated(spark, dir, name)

  /** Same derivation as SQL text, for oracle CTEs. */
  val tradesSql: String =
    """SELECT event_id AS trade_id, ts AS "timestamp", event_type AS instrument_name,
      |       value AS price, CAST(user_id % 7 + 1 AS DOUBLE) AS amount
      |FROM events""".stripMargin

  /** events recast as a Deribit-like option-trade stream
    * (`collectors/deribit.py:120-131`): deterministic synthesized expiry /
    * strike / option_type / iv / mark_price / index_price, plus the Deribit
    * instrument-name string (`BTC-4JAN19-3500-P` format) — 10% of rows get a
    * malformed name to exercise the parse-and-drop path
    * (`collectors/deribit.py:49-51,90-92`). Every derivation is a pure
    * IEEE-double / integer expression so the DuckDB oracle CTE
    * ([[graft.Oracles.optionTradesCte]]) is bit-identical.
    */
  def optionTrades(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
    val expiry = date_add(to_date(col("ts")), (col("user_id") % 30 + 1).cast("int"))
    val strike = (col("user_id") % 20 * 500 + 10000).cast("int")
    val optionType = when(col("event_id") % 2 === 0, "C").otherwise("P")
    // dd/MON/yy built arithmetically (dayofmonth / map / lpad) rather than
    // with date_format: identical output, no per-row DateTimeFormatter work,
    // and small enough to stay inside whole-stage codegen when filters get
    // pushed into it.
    val monAbbrev = typedLit(operators.Maintenance.monthNumbers.map(_.swap))
    val name = when(col("event_id") % 10 === 0,
        concat(lit("MALFORMED-"), col("event_id")))
      .otherwise(concat(
        lit("BTC-"),
        dayofmonth(expiry).cast("string"), element_at(monAbbrev, month(expiry)),
        lpad((year(expiry) % 100).cast("string"), 2, "0"),
        lit("-"), strike, lit("-"), optionType))
    e.select(
      col("event_id").as("trade_id"),
      col("ts").as("timestamp"),
      name.as("instrument_name"),
      expiry.as("expiry_date"),
      strike.as("strike"),
      optionType.as("option_type"),
      col("value").as("price"),
      (col("user_id") % 7 + 1).cast("double").as("amount"),
      when(col("event_id") % 5 === 0, lit(null)).otherwise(col("value") / 2).as("iv"),
      when(col("event_id") % 7 === 0, lit(null)).otherwise(col("value") * 1.01).as("mark_price"),
      (col("value") * 10 + 5).as("index_price"))
  }
}
