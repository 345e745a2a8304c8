package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Generic relational capability on the star schema (SURVEY.md §7 step 4).
  * The reference has no joins (SURVEY §2.3) — these queries establish the
  * table-stakes relational surface: pushdown-friendly scans, broadcast dim
  * joins, partial-agg groupBys, deterministic top-k, frame windows.
  */
object Relational {

  private val DEC = "decimal(38,6)"
  private def dsum(c: Column): Column = sum(c.cast(DEC)).cast("double")

  /** TPC-H Q1-style pricing summary: single hash-agg with partial aggregation;
    * the shipdate filter is pushed to the parquet scan.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      // to_timestamp honors spark.sql.session.timeZone; a java.sql.Timestamp
      // literal would parse in the JVM default zone and shift the boundary
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))
          .as("sum_charge"),
        count(lit(1)).as("count_order"))

  /** Filter + projection — both must reach the parquet scan (PushedFilters /
    * pruned ReadSchema in the physical plan).
    */
  def filterProject(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_type") === "purchase" && col("value") > 100)
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))

  /** Revenue by region/nation: lineitem⋈orders (large-large, left to AQE) with
    * customer/nation/region broadcast — at 100 TB the dims stay broadcast-able
    * while the fact join shuffles on the join key only.
    */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Grouped agg over orders by priority × month. */
  def ordersByPriority(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"),
        date_trunc("MONTH", col("o_orderdate")).as("order_month"))
      .agg(
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total_price"),
        countDistinct(col("o_custkey")).as("n_customers"))

  /** Deterministic top-k: revenue per customer, ordered by (revenue desc, key)
    * so ties cannot make the LIMIT ambiguous. At scale this is a partial
    * agg + single reduce of k rows (TakeOrderedAndProject), not a full sort.
    */
  def topCustomers(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    o.groupBy(col("o_custkey"))
      .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("revenue"), col("n_orders"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(k)
  }

  /** Frame-spec window: per-customer running order total in date order.
    * Decimal accumulation keeps the running sum association-independent for
    * exact oracle parity.
    */
  def runningOrderTotal(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"),
        sum(col("o_totalprice").cast(DEC)).over(w).cast("double").as("running_total"),
        row_number().over(
          Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey")))
          .cast("long").as("order_seq"))
  }

  /** Ranking-window breadth: rank / dense_rank / ntile over customers by
    * account balance within market segment.
    */
  def rankWindows(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(spark, dir)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        rank().over(w).cast("long").as("bal_rank"),
        dense_rank().over(w).cast("long").as("bal_dense_rank"),
        ntile(4).over(w).cast("long").as("bal_quartile"),
        lead(col("c_custkey"), 1).over(w).as("next_custkey"))
  }

  /** Anti-join: customers holding no orders (NOT EXISTS). */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))

  /** Pivot: order counts per (month × status) — statuses become columns.
    * Explicit pivot values keep the output schema static (at scale an
    * unbounded pivot would need a values-discovery pass).
    */
  def orderStatusPivot(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(date_trunc("MONTH", col("o_orderdate")).as("order_month"))
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("O", "F", "P"))
      .withColumnsRenamed(Map("O" -> "n_open", "F" -> "n_filled", "P" -> "n_partial"))

  /** Moment-based statistics from exact decimal sums: built-in stddev/corr
    * use order-dependent streaming formulas (Welford) that can't bit-match
    * across engines; deriving from Σx, Σx², Σxy (exact decimal, association-
    * independent) makes variance/stddev/corr reproducible anywhere. 4-dp
    * rounded (the final sqrt/divide are engine-libm dependent in the last
    * bits).
    */
  def valueStats(spark: SparkSession, dir: String): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("double")
    val stats = Tables.events(spark, dir)
      .select(col("event_type"), col("value"), k.as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).cast("double").as("n"),
        dsum(col("value")).as("sx"),
        dsum(col("value") * col("value")).as("sxx"),
        dsum(col("k")).as("sy"),
        dsum(col("k") * col("k")).as("syy"),
        dsum(col("value") * col("k")).as("sxy"))
    val n = col("n")
    val varX = (col("sxx") - col("sx") * col("sx") / n) / (n - 1)
    val varY = (col("syy") - col("sy") * col("sy") / n) / (n - 1)
    val covXY = (col("sxy") - col("sx") * col("sy") / n) / (n - 1)
    stats.select(
      col("event_type"),
      n.cast("long").as("n_events"),
      bround(col("sx") / n, 4).as("mean_value"),
      bround(sqrt(varX), 4).as("stddev_value"),
      bround(covXY / (sqrt(varX) * sqrt(varY)), 4).as("corr_value_k"))
  }

  /** Fixed-width histogram of `value` per instrument: bucket index is a pure
    * expression (floor((v - lo) / width)), so binning is one map-side pass +
    * one keyed aggregation — no sort, no per-group state.
    */
  def valueHistogram(spark: SparkSession, dir: String,
                     lo: Double = 0.0, width: Double = 50.0): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"),
        floor((col("value") - lo) / width).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
        dsum(col("value")).as("sum_value"))

  /** ROLLUP grouping-set aggregation: per-priority totals plus the grand
    * total in one pass (capability beyond the reference, SURVEY §2.4 notes
    * it has none).
    */
  def rollupStats(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .rollup(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
      .select(coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("total_price"))

  /** Semi-structured extraction: the events `props` JSON field
    * (`get_json_object`, SURVEY §2.8 note) aggregated per instrument.
    */
  def jsonProps(spark: SparkSession, dir: String): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("long")
    Tables.events(spark, dir)
      .select(col("event_type"), k.as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        (sum(col("k")).cast("double") / count(lit(1))).as("mean_k"))
  }

  /** Semi-structured VARIANT path (Spark 4 native): `props` parsed ONCE into
    * a binary-encoded VARIANT, fields then extracted with typed
    * `variant_get` — unlike per-field `get_json_object` (see [[jsonProps]]),
    * which re-parses the JSON string for every extraction. At 100 TB of
    * semi-structured events the single-parse shape is the one that matters;
    * the extraction itself stays inside whole-stage codegen.
    */
  def variantProps(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        variant_get(parse_json(col("props")), "$.k", "long").as("k"))
      .groupBy(col("event_type"), expr("k div 10").as("k_bucket"))
      .agg(count(lit(1)).as("n"), min(col("k")).as("k_min"), max(col("k")).as("k_max"))

  /** Correlated SCALAR subqueries (the one relational family previously
    * unexercised): customers whose total order spend exceeds their nation's
    * per-customer average, with the nation average surfaced via two
    * correlated scalar subqueries in the SELECT list. Declared as
    * subqueries and left to Catalyst to DECORRELATE
    * (RewriteCorrelatedScalarSubquery): the executed plan is a nation-level
    * aggregate joined back — not a per-row re-execution — so at 100 TB this
    * is the same two-shuffle + broadcast shape a hand-written join would
    * give, which is exactly why the declarative form is safe to offer.
    *
    * Exactness: per-customer totals are DECIMAL sums (association-
    * independent), cast to DOUBLE only at the comparison/output boundary;
    * the avg division is one IEEE double op on identical operands in both
    * engines, so the filter boundary is bit-stable. The count subquery is
    * ≥ 1 whenever the outer row survives the cust_totals join (the customer
    * itself is counted), so the division is total.
    */
  def scalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer")
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    Tables.nation(spark, dir).createOrReplaceTempView("nation")
    spark.sql("""
      WITH cust_totals AS (
        SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(38,6))) AS cust_total_dec
        FROM orders GROUP BY o_custkey),
      enriched AS (
        SELECT c.c_custkey, c.c_name, n.n_name,
               CAST(ct.cust_total_dec AS DOUBLE) AS cust_total,
               CAST((SELECT sum(ct2.cust_total_dec)
                     FROM cust_totals ct2 JOIN customer c2 ON ct2.o_custkey = c2.c_custkey
                     WHERE c2.c_nationkey = c.c_nationkey) AS DOUBLE)
                 / (SELECT count(*)
                    FROM cust_totals ct3 JOIN customer c3 ON ct3.o_custkey = c3.c_custkey
                    WHERE c3.c_nationkey = c.c_nationkey) AS nation_avg
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN cust_totals ct ON ct.o_custkey = c.c_custkey)
      SELECT * FROM enriched WHERE cust_total > nation_avg""")
  }

  /** Correlated IN predicate: each customer's most expensive order(s) — the
    * IN set is an aggregated subquery correlated on the customer key.
    * Catalyst rewrites the predicate into a semi-join against the
    * decorrelated per-customer MAX aggregate (RewritePredicateSubquery), so
    * the plan is one partial-agg shuffle + join, never a per-row probe.
    * o_totalprice values are compared as READ (no arithmetic), so the
    * max-equality is bit-stable cross-engine.
    */
  def correlatedIn(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    spark.sql("""
      SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, o.o_totalprice
      FROM orders o
      WHERE o.o_totalprice IN (SELECT max(o2.o_totalprice) FROM orders o2
                               WHERE o2.o_custkey = o.o_custkey)""")
  }

  /** LATERAL correlated subquery: each customer's top-2 orders by price —
    * the per-group top-N idiom in its declarative form. Catalyst
    * decorrelates the LIMIT-ed lateral into a ranked window join
    * (DecorrelateInnerQuery), so the executed plan is one partial top-N per
    * partition — no per-customer re-execution, same shape as a hand-written
    * row_number filter.
    */
  def lateralTopOrders(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer")
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    spark.sql("""
      SELECT c.c_custkey, c.c_name, t.o_orderkey, t.o_totalprice
      FROM customer c,
      LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
               WHERE o.o_custkey = c.c_custkey
               ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t""")
  }

  /** UNPIVOT: per-priority aggregate columns melted back to (metric, value)
    * rows — the inverse of [[orderStatusPivot]]'s widening. Values are cast
    * to one type up front (UNPIVOT requires a common value type), sums as
    * exact decimals first.
    */
  def unpivotPriorityMetrics(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    spark.sql("""
      SELECT o_orderpriority, metric, value FROM (
        SELECT o_orderpriority,
               CAST(count(*) AS DOUBLE) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price,
               CAST(count(DISTINCT o_custkey) AS DOUBLE) AS n_customers
        FROM orders GROUP BY o_orderpriority)
      UNPIVOT (value FOR metric IN (n_orders, total_price, n_customers))""")
  }

  /** Set operations: customers in the top decile by account balance vs
    * customers holding open orders — union/intersect/except in one result.
    */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val rich = c.filter(col("c_acctbal") > 8000).select(col("c_custkey"))
    val active = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "O").select(col("o_custkey").as("c_custkey"))
    rich.intersect(active).withColumn("set_kind", lit("both"))
      .union(rich.except(active).withColumn("set_kind", lit("rich_only")))
  }

  /** Inactivity-gap sessionization (clickstream → sessions): events of one
    * user belong to the same session while consecutive gaps stay within
    * `gapMinutes`. Uses Spark's native `session_window` — a single
    * hash-partition on user_id with session merging inside the aggregate,
    * the same primitive the streaming path uses — so batch and streaming
    * sessionization share semantics. One shuffle, no window sort pass; at
    * 100 TB this is a plain keyed aggregation (no per-user data ordering
    * requirement beyond the in-partition merge).
    *
    * Output keys on (user_id, session_start); bounds are min/max event ts
    * (not the gap-extended window end, which is engine-specific). The value
    * sum is an exact decimal, cast to double only at the boundary.
    */
  def userSessions(spark: SparkSession, dir: String, gapMinutes: Int = 480): DataFrame =
    sessionize(Tables.events(spark, dir), gapMinutes)

  /** [[userSessions]]' core over any (user_id, ts, value) frame —
    * factored out so invariants are property-testable on random data.
    */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("total_value"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("total_value"))

  /** Trailing time-range window: per instrument (event_type), the count and
    * exact-decimal sum of `value` over the trailing hour RELATIVE TO EACH
    * ROW — a range frame on the epoch-ms ordering key, not a fixed bucket.
    * One shuffle + one sort per partition key; the frame is evaluated by a
    * sliding aggregate over the sorted run, so cost is O(n) per partition
    * and the plan survives scale-up as long as a single (event_type) run
    * fits a partition — the same contract every ordered window here has.
    * Range frames are value-based: ties in ts land in the same frame for
    * every peer row, so the result is deterministic without a tiebreaker.
    */
  def trailingWindow(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"), col("ts"), col("value"),
        unix_millis(col("ts")).as("__ms"))
    val hourMs = 3600L * 1000
    val w = Window.partitionBy(col("event_type")).orderBy(col("__ms"))
      .rangeBetween(-hourMs, 0)
    ev.select(col("event_type"), col("event_id"), col("ts"),
      count(lit(1)).over(w).as("trailing_n"),
      sum(col("value").cast(DEC)).over(w).cast("double").as("trailing_value"))
  }

  /** CUBE grouping sets: order counts and exact-decimal totals at every
    * combination of (priority, status) including both margins and the grand
    * total — one pass, Spark expands the grouping sets map-side (the Expand
    * operator) so the input is still read once.
    */
  def cubeStats(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
      .select(
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("n_orders"), col("total_price"))
}
