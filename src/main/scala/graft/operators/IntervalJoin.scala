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

  /** Replication guard: an interval spanning more than this many bins fails
    * LOUDLY (row-level `raise_error`) instead of exploding toward Spark's
    * ~2^31 array-length ceiling or silently multiplying shuffle volume — a
    * single open-ended interval with a small binWidth would otherwise
    * dominate the job. The caller's fix is a larger binWidth (or splitting
    * pathological intervals); at 2^20 bins the guard never fires for any
    * sane span/binWidth pairing.
    */
  val MaxBinsPerInterval: Long = 1L << 20

  /** Exact floor division for bin keys: long `/` in Spark routes through
    * DOUBLE division, which above 2^53/binWidth can round a point and its
    * covering interval into DIFFERENT bins and silently drop matches.
    * `p − pmod(p, w)` is the greatest multiple of w ≤ p (floor semantics
    * for negative points too, since pmod is non-negative); integral `div`
    * of the exact multiple is then exact at any magnitude.
    */
  private def floorDiv(p: Column, w: Long): Column =
    call_function("div", p - pmod(p, lit(w)), lit(w))

  /** Join `facts` to the intervals whose half-open range `[start, end)`
    * contains `point`. `point`/`start`/`end` must be integral expressions in
    * the same unit (e.g. days since epoch). Column names must not collide
    * across the two inputs (enforced). Empty/inverted intervals are dropped
    * (they can contain nothing, and `sequence` would walk backwards).
    */
  def binnedJoin(facts: DataFrame, point: Column,
                 intervals: DataFrame, start: Column, end: Column,
                 binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val reserved = Seq("__p", "__fbin", "__s", "__e", "__ibin", "__nbins")
    val fCols = facts.columns.toSeq
    val iCols = intervals.columns.toSeq
    val overlap = fCols.intersect(iCols)
    require(overlap.isEmpty,
      s"facts and intervals share column names ${overlap.mkString(", ")} — " +
        "rename one side; the bin join would produce ambiguous references")
    val clash = (fCols ++ iCols).intersect(reserved)
    require(clash.isEmpty,
      s"inputs must not contain reserved working columns ${clash.mkString(", ")}")
    val f = facts.withColumn("__p", point.cast("long"))
      .withColumn("__fbin", floorDiv(col("__p"), binWidth))
    val iv = intervals
      .withColumn("__s", start.cast("long"))
      .withColumn("__e", end.cast("long"))
      .filter(col("__e") > col("__s"))
      .withColumn("__nbins",
        floorDiv(col("__e") - 1, binWidth) - floorDiv(col("__s"), binWidth) + 1)
      .withColumn("__ibin", explode(sequence(
        when(col("__nbins") > MaxBinsPerInterval, raise_error(concat(
          lit(s"interval spans more than $MaxBinsPerInterval bins of width $binWidth ["),
          col("__s"), lit(", "), col("__e"),
          lit(") — raise binWidth or split the interval"))))
          .otherwise(floorDiv(col("__s"), binWidth)),
        floorDiv(col("__e") - 1, binWidth))))
    f.join(iv,
        col("__fbin") === col("__ibin") &&
          col("__p") >= col("__s") && col("__p") < col("__e"))
      .drop("__p", "__fbin", "__s", "__e", "__ibin", "__nbins")
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
