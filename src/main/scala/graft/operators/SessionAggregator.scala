package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** The one justified custom kernel per SURVEY.md §2.10: a typed single-pass
  * `Aggregator` for the session OHLC roll-up, replacing the window
  * (row_number) + hash-aggregate encoding in [[Ohlc.sessionRollup]] with one
  * partial-aggregable pass.
  *
  * Sessions are BOUNDED (24 hourly bars per daily session, ≤7 daily bars per
  * weekly, ≤31 per monthly), so the buffer simply accumulates the session's
  * bars and the finish step replays the reference's Python scan
  * (`aggregators/base.py:87-153`) verbatim: strict-`>` first-occurrence
  * argmax for highs, strict-`<` for lows, positional indices, half-even 4-dp
  * pct changes, chmax / firstextremumtype tie rules.
  *
  * At scale this halves the shuffle work of the window encoding: partial
  * buffers combine map-side, one exchange on (instrument, session), no sort.
  */
object SessionAggregator {

  case class Bar(t: Timestamp, open: Double, high: Double, low: Double, close: Double)

  case class SessionOut(open: Double, high: Double, low: Double, close: Double,
                        move: Double, chhigh: Double, chlow: Double, chclose: Double,
                        chmax: Double, chhightime: Long, chlowtime: Long,
                        firstextremumtype: String, n_rows: Long)

  /** Python round(Decimal, 4) — HALF_EVEN, like Spark bround. */
  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_EVEN).toDouble

  private def pct(open: Double, target: Double): Double =
    if (open == 0) 0.0 else r4((target - open) / open * 100)

  val agg: Aggregator[Bar, List[Bar], SessionOut] =
    new Aggregator[Bar, List[Bar], SessionOut] {
      def zero: List[Bar] = Nil
      def reduce(b: List[Bar], a: Bar): List[Bar] = a :: b
      def merge(b1: List[Bar], b2: List[Bar]): List[Bar] = b1 ::: b2

      def finish(buf: List[Bar]): SessionOut = {
        val rows = buf.sortBy(_.t.getTime).toArray
        val open = rows.head.open
        val close = rows.last.close
        var hi = rows(0).high; var hiIdx = 0
        var lo = rows(0).low; var loIdx = 0
        var i = 1
        while (i < rows.length) { // strict > / < keeps FIRST occurrence
          if (rows(i).high > hi) { hi = rows(i).high; hiIdx = i }
          if (rows(i).low < lo) { lo = rows(i).low; loIdx = i }
          i += 1
        }
        val chhigh = pct(open, hi)
        val chlow = pct(open, lo)
        val chclose = pct(open, close)
        val chmax = if (math.abs(chhigh) > math.abs(chlow)) chhigh else chlow
        val fet =
          if (hiIdx < loIdx) "HIGH"
          else if (loIdx < hiIdx) "LOW"
          else if (math.abs(chhigh) >= math.abs(chlow)) "HIGH" else "LOW"
        SessionOut(open, hi, lo, close, hi - lo, chhigh, chlow, chclose,
          chmax, hiIdx.toLong, loIdx.toLong, fet, rows.length.toLong)
      }

      def bufferEncoder: Encoder[List[Bar]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Bar]]()
      def outputEncoder: Encoder[SessionOut] = Encoders.product[SessionOut]
    }

  /** Same output schema as [[Ohlc.sessionRollup]]+select, via the typed
    * single-pass kernel. `sessionStart` as in the window encoding.
    */
  def sessionRollupTyped(bars: DataFrame, sessionStart: Column => Column,
                         minRows: Int): DataFrame = {
    val spark = bars.sparkSession
    import spark.implicits._
    val keyed = bars
      .withColumn("session_start", sessionStart(col("t")))
      .select(col("instrument"), col("session_start"),
        struct(col("t"), col("open"), col("high"), col("low"), col("close")).as("bar"))
      .as[(String, Timestamp, Bar)]
    keyed
      .groupByKey { case (inst, sess, _) => (inst, sess) }
      .mapValues(_._3)
      .agg(agg.toColumn.name("s"))
      .toDF("key", "s")
      .select(col("key._2").as("session_start"), col("key._1").as("instrument"),
        col("s.open"), col("s.close"), col("s.high"), col("s.low"),
        col("s.chhightime"), col("s.chlowtime"), col("s.n_rows"),
        col("s.move"), col("s.chhigh"), col("s.chlow"), col("s.chclose"),
        col("s.chmax"), col("s.firstextremumtype"))
      .filter(col("n_rows") >= minRows)
  }
}
