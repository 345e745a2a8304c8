package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("asOfJoin picks the latest right row at or before each left row") {
    val left = Seq(
      ("a", sqlTs("2024-01-01 10:05:00"), 1L, 10.0),
      ("a", sqlTs("2024-01-01 11:00:00"), 2L, 11.0), // exactly at a bar → that bar
      ("a", sqlTs("2024-01-01 09:00:00"), 3L, 9.0), // before any bar → nulls
      ("b", sqlTs("2024-01-01 12:00:00"), 4L, 12.0))
      .toDF("instrument", "timestamp", "trade_id", "price")
    val right = Seq(
      ("a", sqlTs("2024-01-01 10:00:00"), 1.0, 2.0),
      ("a", sqlTs("2024-01-01 11:00:00"), 3.0, 4.0),
      ("b", sqlTs("2024-01-01 07:00:00"), 5.0, 6.0))
      .toDF("instrument", "t", "open", "close")

    val r = AsOf.asOfJoin(left, right, "instrument", "timestamp", "t",
      Seq("trade_id", "price"), Seq("open", "close"))
      .collect().map(x => x.getAs[Long]("trade_id") ->
        (Option(x.getAs[java.sql.Timestamp]("asof_t")).map(_.toString),
          Option(x.getAs[Any]("asof_open")))).toMap

    assert(r(1L)._1.contains("2024-01-01 10:00:00.0"))
    assert(r(2L)._1.contains("2024-01-01 11:00:00.0")) // equal ts → visible
    assert(r(3L)._1.isEmpty && r(3L)._2.isEmpty) // LEFT semantics
    assert(r(4L)._1.contains("2024-01-01 07:00:00.0"))
  }
}
