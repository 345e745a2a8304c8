package graft

import graft.operators.Corpus

/** The Bloom-prefiltered decontamination must be RESULT-identical to the
  * exact semi-join form — the filter only prunes shuffle volume. Also
  * forces a tiny, saturated Bloom (every probe a potential false positive)
  * to prove false positives cannot leak into the output.
  */
class BloomDecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    Tables.documents(spark, dir)
  }

  private def asMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.as[(Long, Long)].collect().toMap

  test("bloom form equals the exact form on testdata") {
    val exact = asMap(Corpus.decontaminate(docs))
    val bloom = asMap(Corpus.decontaminateBloom(docs))
    assert(exact.nonEmpty)
    assert(bloom === exact)
  }

  test("a saturated (undersized) bloom still yields the exact result") {
    val exact = asMap(Corpus.decontaminate(docs))
    // 4 expected items for thousands of shingles: fpp ~ 1, so the
    // prefilter passes nearly everything and the semi-join must do all
    // the work — false positives may not appear in the output
    val bloom = asMap(Corpus.decontaminateBloom(docs, expectedItems = 4L))
    assert(bloom === exact)
  }

  test("contaminationScores: fractions agree with the hit counts; shingle-less rows unflagged") {
    import org.apache.spark.sql.functions.col
    val scored = Corpus.contaminationScores(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val exact = asMap(Corpus.decontaminate(docs))
    // every train doc appears exactly once; counts match the exact form
    assert(scored.nonEmpty)
    exact.foreach { case (id, n) =>
      assert(scored(id).getAs[Long]("n_contaminated") == n, s"doc $id")
    }
    scored.values.foreach { r =>
      val (nSh, nC) = (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_contaminated"))
      if (nSh == 0L) {
        assert(r.isNullAt(r.fieldIndex("contamination")))
        assert(!r.getAs[Boolean]("flagged"))
      } else {
        val frac = r.getAs[Double]("contamination")
        assert(frac == nC.toDouble / nSh)
        assert(r.getAs[Boolean]("flagged") == (frac >= 0.2))
      }
    }
    // uncontaminated train docs are present with a zero count
    assert(scored.values.exists(_.getAs[Long]("n_contaminated") == 0L))
  }
}
