package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys at scale. AQE's skew-join handling covers
  * sort-merge joins at runtime; these cover the two cases it doesn't:
  * aggregation skew (one instrument with 100× the trades) and broadcast-side
  * replication joins when a hot build key would overwhelm one task.
  *
  * Salt is deterministic (xxhash64 of a caller-chosen discriminator column,
  * mod buckets) — reruns produce identical partitioning, keeping jobs
  * replay-stable.
  */
object Skew {

  /** Two-phase salted aggregation: groupBy (keys + salt) computes partials,
    * then groupBy (keys) combines — the hot key's rows are spread over
    * `buckets` tasks in phase 1 instead of hammering one reducer. Covers the
    * algebraic aggregates the engine uses (sum / count / min / max).
    */
  def saltedOhlcAgg(df: DataFrame, keys: Seq[String], priceCol: String,
                    amountCol: String, discriminator: String,
                    buckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(col(discriminator)), lit(buckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(
        sum(col(amountCol).cast("decimal(38,6)")).as("p_volume"),
        count(lit(1)).as("p_count"),
        max(col(priceCol)).as("p_high"),
        min(col(priceCol)).as("p_low"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("p_volume")).cast("double").as("volume"),
        sum(col("p_count")).as("trade_count"),
        max(col("p_high")).as("high_price"),
        min(col("p_low")).as("low_price"))
  }

  /** Salted replication join for a hot-keyed fact ⋈ dim in the SHUFFLE join
    * regime (dim too big to broadcast — a broadcast join never shuffles the
    * fact by key, so salting would be a no-op there): the dim is replicated
    * `buckets`× with an explicit salt, the fact gets a deterministic salt,
    * and the (key, salt) shuffle spreads a hot key over `buckets` reducers.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 discriminator: String, buckets: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(col(discriminator)), lit(buckets)))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets - 1L))))
    saltedFact.join(replicatedDim, Seq(key, "__salt")).drop("__salt")
  }
}
