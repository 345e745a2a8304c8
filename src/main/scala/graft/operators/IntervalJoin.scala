package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Interval-containment join WITHOUT an equi-key, binned for scale.
  *
  * The reference's only interval pattern — record→session assignment
  * (`aggregators/daily_sessions.py:107-132`) — has derivable boundaries, so
  * it compiles to a per-row bucket key and needs no join at all (J1). The
  * generic capability this operator adds is facts against ARBITRARY,
  * irregular intervals (campaign windows, outage ranges, settlement
  * periods), where Spark has no built-in: the naive plan is a
  * BroadcastNestedLoopJoin on the range predicate — fine while one side
  * broadcasts, quadratic death when both sides are large.
  *
  * Bin-replication form: each interval is exploded to every fixed-width bin
  * it overlaps; each fact maps to exactly ONE bin; the join becomes an
  * equi-join on the bin key followed by the exact range predicate. A
  * matching (fact, interval) pair meets in precisely the fact's bin, so no
  * post-join dedup is needed. Shuffle volume is |facts| + |intervals| ×
  * ceil(span/binWidth): pick binWidth near the typical interval span to
  * keep the replication factor O(1). At 100 TB both sides hash-partition on
  * the bin — no broadcast requirement — and a hot bin (skewed day) is split
  * by AQE skew-join handling.
  */
object IntervalJoin {

  /** Join `facts` to the intervals whose half-open range `[start, end)`
    * contains `point`. `point`/`start`/`end` must be integral expressions in
    * the same unit (e.g. days since epoch). Column names must not collide
    * across the two inputs. Empty/inverted intervals are dropped (they can
    * contain nothing, and `sequence` would walk backwards).
    */
  def binnedJoin(facts: DataFrame, point: Column,
                 intervals: DataFrame, start: Column, end: Column,
                 binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val f = facts.withColumn("__p", point.cast("long"))
      .withColumn("__fbin", floor(col("__p") / binWidth))
    val iv = intervals
      .withColumn("__s", start.cast("long"))
      .withColumn("__e", end.cast("long"))
      .filter(col("__e") > col("__s"))
      .withColumn("__ibin", explode(sequence(
        floor(col("__s") / binWidth), floor((col("__e") - 1) / binWidth))))
    f.join(iv,
        col("__fbin") === col("__ibin") &&
          col("__p") >= col("__s") && col("__p") < col("__e"))
      .drop("__p", "__fbin", "__s", "__e", "__ibin")
  }

  /** Driver query: orders landing in month-anchored 10-day "campaign
    * windows" — count and revenue per window. The windows are derived (one
    * per calendar month with any order) purely so the testdata exercises
    * the operator; the join itself treats them as an opaque interval table.
    */
  def campaignWindowStats(spark: SparkSession, dir: String,
                          windowDays: Int = 10): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val epoch = lit("1970-01-01").cast("date")
    val windows = orders
      .select(date_trunc("MONTH", col("o_orderdate")).cast("date")
        .as("campaign_start"))
      .distinct()
      .withColumn("__cs", datediff(col("campaign_start"), epoch))
    binnedJoin(
      orders.select(col("o_orderkey"), col("o_totalprice"),
        to_date(col("o_orderdate")).as("__od")),
      datediff(col("__od"), epoch),
      windows, col("__cs"), col("__cs") + windowDays,
      binWidth = 16L)
      .groupBy(col("campaign_start"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(38,6)")).cast("double")
          .as("revenue"))
  }
}
