package graft

/** Driver-contract consistency: every oracle refers to a real query; every
  * query carries an oracle (no rows-only checks remain — even the stub
  * decode path is mirrored in SQL); entry() smokes.
  */
class ContractSpec extends SparkSpec {

  /** Queries DELIBERATELY registered without an oracle — each needs a
    * documented reason here, so rows-only coverage can never happen by
    * accident. Empty since round 10: the codec trio (q_media_decode /
    * q_audio_decode / q_video_frames) gained full analytic oracles — the
    * synthesized payloads are pure functions of row metadata and the
    * codecs are lossless, so the oracle rebuilds the decoded rasters
    * (digests included) in SQL (OraclesML.scala).
    */
  private val rowsOnlyByDesign = Set.empty[String]

  test("oracleSql keys ⊆ queries keys; every query is oracle-backed") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without queries: ${o -- q}")
    assert((q -- o -- rowsOnlyByDesign).isEmpty,
      s"unexpected rows-only queries: ${q -- o -- rowsOnlyByDesign}")
    assert((rowsOnlyByDesign -- q).isEmpty && (rowsOnlyByDesign & o).isEmpty,
      "rows-only allowlist out of sync")
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
