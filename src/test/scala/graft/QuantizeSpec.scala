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

  test("QuantStore: a reader never pairs in-flight bounds with old codes") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    val emb = Tables.embeddings(spark, dir)
    val root = java.nio.file.Files.createTempDirectory("quantstore_atomic").toString
    val v1 = operators.QuantStore.build(emb, root)
    assert(v1 == 1L)
    val b1 = operators.QuantStore.readBounds(spark, root)
    // simulate a build in flight: the FIRST thing build does for v2 is
    // write v2's bounds — before any codes commit. Plant obviously-wrong
    // bounds there; a reader must still resolve v1 and v1's bounds.
    Seq((Seq.fill(64)(-999.0), Seq.fill(64)(999.0))).toDF("mns", "mxs")
      .coalesce(1).write.parquet(s"$root/_bounds/v2")
    val during = operators.QuantStore.readBounds(spark, root)
    assert(during.mns.toSeq === b1.mns.toSeq && during.mxs.toSeq === b1.mxs.toSeq,
      "reader paired in-flight bounds with the old snapshot")
    // completing a real v2 build flips codes AND bounds together
    import org.apache.spark.sql.functions._
    val emb2 = emb.select($"vec_id",
      transform($"embedding", x => x * 2.0f).as("embedding"))
    val v2 = operators.QuantStore.build(emb2, root)
    assert(v2 == 2L)
    val b2 = operators.QuantStore.readBounds(spark, root)
    val fit2 = Similarity.fitQuantBounds(emb2)
    assert(b2.mns.toSeq === fit2.mns.toSeq && b2.mxs.toSeq === fit2.mxs.toSeq)
    // pinned read of the superseded version still pairs v1's own model
    val b1Again = operators.QuantStore.readBoundsAt(spark, root, 1L)
    assert(b1Again.mns.toSeq === b1.mns.toSeq)
  }

  test("QuantStore.ingestBatch: frozen-bounds append, out-of-range saturates") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    val emb = Tables.embeddings(spark, dir)
    val root = java.nio.file.Files.createTempDirectory("quantstore_ingest").toString
    val v1 = operators.QuantStore.build(emb, root)
    val b1 = operators.QuantStore.readBounds(spark, root)
    val nCorpus = operators.QuantStore.read(spark, root).count()
    // batch: one in-distribution vector + one far outside the fitted range
    import org.apache.spark.sql.functions._
    val inRange = emb.limit(1)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val outRange = emb.limit(1).select((col("vec_id") + 2000000L).as("vec_id"),
      transform(col("embedding"), x => x * 1000.0f).as("embedding"))
    val v2 = operators.QuantStore.ingestBatch(inRange.union(outRange), root)
    assert(v2 == v1 + 1)
    // append: corpus rows carried forward, batch rows added
    val staged = operators.QuantStore.read(spark, root)
    assert(staged.count() == nCorpus + 2)
    // the model is FROZEN across the tick (copied forward, not refitted)
    val b2 = operators.QuantStore.readBounds(spark, root)
    assert(b2.mns.toSeq === b1.mns.toSeq && b2.mxs.toSeq === b1.mxs.toSeq)
    // out-of-distribution codes saturate at the int8 edges instead of
    // overflowing; every staged norm stays finite
    val codes = staged.filter(col("vec_id") >= 2000000L)
      .selectExpr("explode(codes) AS c").as[Byte].collect()
    assert(codes.forall(c => c == -128 || c == 127))
    assert(staged.selectExpr("max(CASE WHEN isnan(dnorm) THEN 1 ELSE 0 END)")
      .as[Int].collect().head == 0)
  }

  test("clamped quantization keeps null elements null (no silent saturation)") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    val emb = Tables.embeddings(spark, dir)
    val root = java.nio.file.Files.createTempDirectory("quantstore_null").toString
    operators.QuantStore.build(emb, root)
    import org.apache.spark.sql.functions._
    // a null element must quantize to a null code — least/greatest SKIP
    // nulls, so an unguarded clamp would emit a saturated max code (127):
    // a wrong extreme value where the module contract propagates null
    val nullBatch = emb.limit(1)
      .select((col("vec_id") + 3000000L).as("vec_id"),
        concat(slice(col("embedding"), 1, 3),
          array(lit(null).cast("float")),
          slice(col("embedding"), 5, 10000)).as("embedding"))
    operators.QuantStore.ingestBatch(nullBatch, root)
    val codes = operators.QuantStore.read(spark, root)
      .filter(col("vec_id") >= 3000000L)
      .selectExpr("codes[3] AS c").collect()
    assert(codes.length == 1 && codes.head.isNullAt(0),
      s"null element must stay null through the clamp, got ${codes.head}")
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
