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

  test("quantized ANN keeps k results per query and high recall vs exact") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    val emb = Tables.embeddings(spark, dir)
    val exact = Similarity.annBruteForce(emb)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val quant = Similarity.annQuantized(emb)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(quant.keySet === exact.keySet)
    assert(quant.values.forall(_.size === 5))
    val recalls = exact.map { case (q, n) =>
      quant(q).intersect(n).size.toDouble / n.size }
    val mean = recalls.sum / recalls.size
    // 8-bit scalar quantization on 64-dim vectors: observed ~0.95; the
    // floor guards against a broken dequant path, not statistical drift
    assert(mean >= 0.7, s"mean recall@5 = $mean")
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
