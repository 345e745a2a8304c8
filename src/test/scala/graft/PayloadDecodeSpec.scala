package graft

import graft.sources.PayloadDecode

class PayloadDecodeSpec extends SparkSpec {
  import spark.implicits._

  test("kline positional-array decode: typed fields, malformed rows dropped") {
    val payloads = Seq(
      """[1712000000000,"342.07","349.07","337.07","342.44","7.3"]""",
      """[1712000060000,"100.00","107.00","95.00","100.37","0.0"]""",
      "[1712000120000", // truncated mid-array
      "not json at all"
    ).toDF("payload")
    val out = PayloadDecode.decodeKlines(payloads)
      .orderBy("open_time")
      .collect()
    assert(out.length == 2)
    assert(out(0).getTimestamp(0) == sqlTs("2024-04-01 19:33:20"))
    assert(out(0).getDouble(1) == 342.07 && out(0).getDouble(2) == 349.07)
    assert(out(0).getDouble(3) == 337.07 && out(0).getDouble(4) == 342.44)
    assert(out(0).getDouble(5) == 7.3)
    assert(out(1).getDouble(1) == 100.0)
  }

  test("candleSnapshot dict decode: one-letter keys -> sink schema, malformed dropped") {
    val payloads = Seq(
      """{"t":1712000000000,"o":"342.07","h":"349.07","l":"337.07","c":"342.44"}""",
      """{"t":1712000""", // truncated mid-number -> all-null struct
      """{"o":"1.0","h":"1.0","l":"1.0","c":"1.0"}""" // missing t -> dropped
    ).toDF("payload")
    val out = PayloadDecode.decodeCandleSnapshot(payloads).collect()
    assert(out.length == 1)
    assert(out(0).getTimestamp(0) == sqlTs("2024-04-01 19:33:20"))
    assert(out(0).getDouble(1) == 342.07 && out(0).getDouble(4) == 342.44)
  }

  test("synthetic payload fixtures: 10% malformed, decode is the inverse of derivation") {
    val events = Seq(
      (10L, sqlTs("2024-04-01 10:30:15"), 123L, "purchase", 5.0, "{}"),
      (11L, sqlTs("2024-04-01 10:30:45"), 456L, "view", 6.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val klines = PayloadDecode.decodeKlines(
      PayloadDecode.syntheticKlinePayloads(events)).collect()
    // event 10 is the malformed row (event_id % 10 == 0); event 11 survives
    assert(klines.length == 1)
    assert(klines(0).getTimestamp(0) == sqlTs("2024-04-01 10:30:00"))
    assert(klines(0).getDouble(1) == (456 % 900 + 100) + 0.11) // o = base.cents(11)
    assert(klines(0).getDouble(2) == (456 % 900 + 107) + 0.11)
    val candles = PayloadDecode.decodeCandleSnapshot(
      PayloadDecode.syntheticCandlePayloads(events)).collect()
    assert(candles.length == 1)
    assert(candles(0).getDouble(4) == (456 % 900 + 100) + 0.48) // c cents = (11+37)%100
  }
}
