package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate aggregates — the 100 TB-realistic versions of the exact
  * distinct/percentile surface (A4, `q_length_percentiles`).
  *
  * Why they exist: exact `countDistinct` expands every (group, value) pair
  * into the shuffle — at 100 TB the expansion IS the bottleneck (the
  * distinct shuffle is the size of the deduplicated input, not of the group
  * count). `approx_count_distinct` (HyperLogLog++) and `approx_percentile`
  * (Greenwald-Khanna) aggregate in FIXED space per group, merge map-side,
  * and shuffle one sketch per group per mapper — constant-size state where
  * the exact twin's state is data-size. Same group-by shape, so swapping
  * exact → approx is a one-line change for a user.
  *
  * Oracle strategy: sketch internals are engine-specific, so estimates can
  * never hash-match DuckDB. The `*Checked` variants therefore emit the
  * EXACT values (oracle-comparable) plus an `approx_ok` boolean asserting
  * the estimate sits inside its documented error bound — the oracle emits
  * literal TRUE, so a sketch drifting out of tolerance fails the hash gate
  * like any wrong answer. The unchecked variants are the production entry
  * points (no exact twin computed).
  */
object Approx {

  /** Production path: per-group distinct-user estimate at 2% rsd. */
  def approxDistinct(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"))

  /** Oracle-checkable pairing: exact distinct count plus a 5%-relative-error
    * bound check on the HLL++ estimate (2% rsd → 5% is ~2.5σ; a pass is the
    * expected outcome, a fail means the sketch broke).
    */
  def approxDistinctChecked(events: DataFrame, relErr: Double = 0.05): DataFrame =
    events.groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        approx_count_distinct(col("user_id"), 0.02).as("__approx"))
      .select(col("event_type"), col("n_users"),
        (abs(col("__approx") - col("n_users"))
          <= col("n_users").cast("double") * relErr).as("approx_ok"))

  /** Production path: per-language length quantiles from one GK sketch. */
  def approxQuantiles(docs: DataFrame, accuracy: Int = 10000): DataFrame =
    docs.groupBy(col("lang"))
      .agg(approx_percentile(col("n_chars"),
        array(lit(0.5), lit(0.9)), lit(accuracy)).as("approx_quantiles"))

  /** Oracle-checkable pairing: exact interpolated p50/p90 (4-dp, the
    * `q_length_percentiles` convention) plus a RANK-tolerance check — the GK
    * guarantee is on rank, not value, so the estimate is asserted to lie
    * within the exact [p45,p55] / [p85,p95] value envelopes (±5% rank, far
    * above the 1/accuracy guarantee).
    */
  def approxQuantilesChecked(docs: DataFrame, accuracy: Int = 10000): DataFrame =
    docs.groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        bround(percentile(col("n_chars"), lit(0.5)), 4).as("p50_chars"),
        bround(percentile(col("n_chars"), lit(0.9)), 4).as("p90_chars"),
        percentile(col("n_chars"), lit(0.45)).as("__p45"),
        percentile(col("n_chars"), lit(0.55)).as("__p55"),
        percentile(col("n_chars"), lit(0.85)).as("__p85"),
        percentile(col("n_chars"), lit(0.95)).as("__p95"),
        approx_percentile(col("n_chars"),
          array(lit(0.5), lit(0.9)), lit(accuracy)).as("__ap"))
      .select(col("lang"), col("n_docs"), col("p50_chars"), col("p90_chars"),
        (element_at(col("__ap"), 1).between(col("__p45"), col("__p55"))
          && element_at(col("__ap"), 2).between(col("__p85"), col("__p95")))
          .as("approx_ok"))
}
