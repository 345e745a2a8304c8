package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Salted two-phase aggregation and salted replication join must equal their
  * unsalted forms on skewed data (one key with 100x the rows).
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val skewed = {
    val hot = (1 to 5000).map(i => ("HOT", i.toLong, 100.0 + i % 7, 2.0))
    val cold = (1 to 50).flatMap(i => Seq((s"cold_$i", i.toLong, 50.0 + i, 1.0)))
    (hot ++ cold).toDF("instrument", "trade_id", "price", "amount")
  }

  test("saltedOhlcAgg == direct groupBy on skewed data") {
    val salted = Skew.saltedOhlcAgg(skewed, Seq("instrument"),
      "price", "amount", discriminator = "trade_id")
    val direct = skewed.groupBy(col("instrument")).agg(
      sum(col("amount").cast("decimal(38,6)")).cast("double").as("volume"),
      count(lit(1)).as("trade_count"),
      max(col("price")).as("high_price"),
      min(col("price")).as("low_price"))
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
    assert(salted.count() == 51)
  }

  test("saltedJoin == plain join") {
    val dim = Seq(("HOT", "hot dim"), ("cold_1", "c1"), ("cold_2", "c2"))
      .toDF("instrument", "label")
    val salted = Skew.saltedJoin(skewed, dim, "instrument", discriminator = "trade_id")
      .select("instrument", "trade_id", "label")
    val plain = skewed.join(dim, "instrument").select("instrument", "trade_id", "label")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    assert(salted.count() == plain.count())
  }
}
