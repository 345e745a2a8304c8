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

  test("graft_dot_i8 matches the declarative double fold on int8 codes") {
    graft.functions.VectorExpressions.register(spark)
    val df = Seq((Seq(0.5, -1.25, 2.0), Seq(-128.toByte, 0.toByte, 127.toByte)))
      .toDF("w", "b")
    val (kernel, fold) = df.selectExpr(
      "graft_dot_i8(w, b)",
      "aggregate(zip_with(w, transform(b, x -> CAST(x AS DOUBLE)), (p, q) -> p * q), 0.0D, (acc, x) -> acc + x)")
      .as[(Double, Double)].collect().head
    assert(kernel === fold)
    assert(kernel === (0.5 * -128 + -1.25 * 0 + 2.0 * 127))
  }

  test("staged codes carry q - 128 and the dequantized norm") {
    val emb = Seq(
      (1L, Seq(0.0f, 10.0f, 7.5f)),
      (2L, Seq(1.0f, 20.0f, 7.5f)),
      (3L, Seq(2.0f, 30.0f, 7.5f))
    ).toDF("vec_id", "embedding")
    val qb = Similarity.fitQuantBounds(emb)
    assert(qb.mns.toSeq === Seq(0.0, 10.0, 7.5) && qb.mxs.toSeq === Seq(2.0, 30.0, 7.5))
    val got = Similarity.quantizeCodes(emb, qb)
      .as[(Long, Seq[Byte], Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // codes are quantizeEmbeddings' q shifted by the -128 zero-point
    assert(got(1L)._1 === Seq(-128, -128, -128).map(_.toByte))
    assert(got(3L)._1 === Seq(127, 127, -128).map(_.toByte))
    // dnorm = ||mn_i + (q_i + 0.5) * s_i||; constant dim dequantizes to mn
    val s0 = 2.0 / 255.0; val s1 = 20.0 / 255.0
    val d1 = Seq(0.0 + 0.5 * s0, 10.0 + 0.5 * s1, 7.5)
    assert(math.abs(got(1L)._2 - math.sqrt(d1.map(x => x * x).sum)) < 1e-12)
  }

  test("QuantStore: search off the staged snapshot equals the self-contained form") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    val emb = Tables.embeddings(spark, dir)
    val root = java.nio.file.Files.createTempDirectory("quantstore").toString
    operators.QuantStore.build(emb, root)
    // staged bounds round-trip the fitted model exactly
    val qb = Similarity.fitQuantBounds(emb)
    val back = operators.QuantStore.readBounds(spark, root)
    assert(back.mns.toSeq === qb.mns.toSeq && back.mxs.toSeq === qb.mxs.toSeq)
    // unit queries built the same way the self-contained path builds them
    graft.functions.VectorExpressions.register(spark)
    import org.apache.spark.sql.functions._
    val q = emb.filter($"vec_id" < 8)
      .select($"vec_id".as("query_id"),
        transform($"embedding", x => x.cast("double")).as("v0"))
      .withColumn("n", sqrt(call_function("graft_dot", $"v0", $"v0")))
      .select($"query_id", transform($"v0", x => x / $"n").as("qv"))
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "neighbor_id")
        .as[(Long, Long, Long)].collect().toSet
    val staged = key(operators.QuantStore.annQuantized(spark, root, q))
    val inline = key(Similarity.annQuantized(emb))
    assert(staged === inline)
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
