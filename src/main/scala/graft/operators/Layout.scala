package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Storage-layout operators for the 100 TB design: bucketed tables make the
  * recurring fact-fact join (lineitem ⋈ orders on orderkey) shuffle-free —
  * both sides are pre-hash-partitioned and sorted on the join key at write
  * time, so the join planner emits SortMergeJoin with NO Exchange. At the
  * reference's scale this is the difference between re-shuffling 100 TB per
  * run and reading co-located buckets.
  *
  * (Date-partitioned layout — the other axis — is exercised by
  * [[Incremental.syncTick]]'s dynamic partition overwrite.)
  */
object Layout {

  /** Write `df` bucketed+sorted on `key` as managed table `name`. */
  def writeBucketed(df: DataFrame, name: String, key: String,
                    buckets: Int = 32): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(name)

  /** Join two bucketed tables on their bucket keys — shuffle-free when both
    * were written with the same bucket count.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   leftKey: String, rightKey: String): DataFrame = {
    // bind both sides once: fresh spark.table() instances in the condition
    // give ambiguous references for self-joins
    val l = spark.table(left)
    val r = spark.table(right)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
