package graft

/** Driver-contract consistency: every oracle refers to a real query; every
  * query carries an oracle (no rows-only checks remain — even the stub
  * decode path is mirrored in SQL); entry() smokes.
  */
class ContractSpec extends SparkSpec {

  test("oracleSql keys ⊆ queries keys; every query is oracle-backed") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without queries: ${o -- q}")
    assert((q -- o).isEmpty, s"unexpected rows-only queries: ${q -- o}")
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
