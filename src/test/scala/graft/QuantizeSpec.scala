package graft

import graft.operators.Similarity

/** Scalar 8-bit quantization semantics on hand-built vectors: endpoints hit
  * 0/255, interior points land on the floor grid, constant dimensions
  * quantize to 0, and every code is within [0, 255].
  */
class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("per-dimension min/max quantization on known vectors") {
    val emb = Seq(
      (1L, Seq(0.0f, 10.0f, 7.5f)),
      (2L, Seq(1.0f, 20.0f, 7.5f)),
      (3L, Seq(2.0f, 30.0f, 7.5f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.quantizeEmbeddings(emb)
      .as[(Long, Seq[Long])].collect().toMap
    // dim0: mn=0 mx=2 -> floor(x/2*255); dim1: mn=10 mx=30; dim2 constant -> 0
    assert(got(1L) === Seq(0L, 0L, 0L))
    assert(got(2L) === Seq(127L, 127L, 0L))
    assert(got(3L) === Seq(255L, 255L, 0L))
  }

  test("codes stay within [0, 255] on testdata and max is attained") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    val q = Similarity.quantizeEmbeddings(Tables.embeddings(spark, dir))
      .selectExpr("explode(qvec) AS q")
    val (mn, mx) = q.selectExpr("min(q)", "max(q)")
      .as[(Long, Long)].collect().head
    assert(mn >= 0L && mx === 255L)
  }
}
