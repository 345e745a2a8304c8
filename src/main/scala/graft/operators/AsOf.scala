package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, the latest right row with
  * `rightTs <= leftTs` on the same key. The canonical finance lookup (trade →
  * latest completed bar) the reference's Postgres schema would need a lateral
  * subquery for; Spark has no built-in, so it's COMPOSED from a union + one
  * per-key ordered window of `last(_, ignoreNulls)` — preference (a) of the
  * custom-operator ladder, no custom plan node needed.
  *
  * Scale: one shuffle on the key, one per-key sort — the same cost class as
  * a merge-based as-of; no row explosion (never a range cross-product).
  * Right-side timestamps are assumed unique per key (true for bar tables).
  */
object AsOf {

  /** Left as-of join. `leftCols`/`rightCols` are the payload columns to carry
    * (key and ts columns handled separately; right payload lands null when no
    * bar precedes the row — LEFT semantics, matching DuckDB `ASOF LEFT JOIN`).
    */
  def asOfJoin(left: DataFrame, right: DataFrame,
               key: String, leftTs: String, rightTs: String,
               leftCols: Seq[String], rightCols: Seq[String]): DataFrame = {
    val rPayload = struct((col(rightTs).as("__rts") +: rightCols.map(col)): _*)
    val lSide = left.select(
      (col(key).as("__k") +: col(leftTs).as("__t") +: lit(1).as("__isLeft") +:
        lit(null).cast(
          right.select(rPayload).schema.head.dataType).as("__r") +:
        leftCols.map(col)): _*)
    val rSide = right.select(
      (col(key).as("__k") +: col(rightTs).as("__t") +: lit(0).as("__isLeft") +:
        rPayload.as("__r") +:
        leftCols.map(c => lit(null).cast(
          left.schema(c).dataType).as(c))): _*)

    // at equal timestamps the right row sorts first (__isLeft asc), so a bar
    // AT the trade's instant is visible — mirrors ASOF `l.t >= r.t`
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__isLeft"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lSide.unionByName(rSide)
      .withColumn("__last_r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__isLeft") === 1)

    val rightOut: Seq[Column] =
      col("__last_r.__rts").as(s"asof_$rightTs") +:
        rightCols.map(c => col(s"__last_r.$c").as(s"asof_$c"))
    matched.select(
      (col("__k").as(key) +: col("__t").as(leftTs) +:
        leftCols.map(col)) ++ rightOut: _*)
  }

  /** Trades enriched with the latest hourly bar at or before each trade. */
  def tradesWithLatestBar(trades: DataFrame, bars: DataFrame): DataFrame =
    asOfJoin(
      trades.select(col("instrument_name").as("instrument"),
        col("timestamp"), col("trade_id"), col("price")),
      bars,
      key = "instrument", leftTs = "timestamp", rightTs = "t",
      leftCols = Seq("trade_id", "price"),
      rightCols = Seq("open", "close"))
}
