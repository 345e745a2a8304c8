package graft

/** Driver-contract consistency: every oracle refers to a real query; the
  * only oracle-less queries are the known rows-only ones; entry() smokes.
  */
class ContractSpec extends SparkSpec {

  test("oracleSql keys ⊆ queries keys; rows-only set is exactly the known one") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without queries: ${o -- q}")
    assert((q -- o) == Set("q_media_features"), s"unexpected rows-only: ${q -- o}")
  }

  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).limit(1).count() == 1L)
  }

  test("every query runs at sf0.001 without error") {
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => fail(s"$name failed: ${e.getMessage}") }
    }
  }
}
