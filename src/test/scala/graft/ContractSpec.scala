package graft

/** Driver-contract consistency: every oracle refers to a real query; every
  * query carries an oracle (no rows-only checks remain — even the stub
  * decode path is mirrored in SQL); entry() smokes.
  */
class ContractSpec extends SparkSpec {

  /** Queries DELIBERATELY registered without an oracle — each needs a
    * documented reason here, so rows-only coverage can never happen by
    * accident.
    */
  private val rowsOnlyByDesign = Set(
    // real javax.imageio PNG round-trip: a codec decode is not
    // SQL-expressible; MultimodalSpec pins the semantics on fixtures
    "q_media_decode",
    // real javax.sound WAV round-trip — same rationale as q_media_decode
    "q_audio_decode",
    // frame sampling + real javax.imageio BMP decode per sampled frame —
    // same rationale; MultimodalSpec pins the slicing and decode semantics
    "q_video_frames")

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
