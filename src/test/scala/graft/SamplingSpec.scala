package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (1L to 4000L).map(i => (i, s"lang_${i % 4}"))
    .toDF("doc_id", "lang")

  test("hex-threshold sampling selects ~the nominal fraction, deterministically") {
    val s1 = Sampling.deterministicSample(docs, col("doc_id"), "4")
    val n = s1.count().toDouble
    assert(math.abs(n / 4000 - 0.25) < 0.05) // 25% ± noise
    val s2 = Sampling.deterministicSample(docs, col("doc_id"), "4")
    assert(s1.exceptAll(s2).isEmpty) // pure function of the key
    // threshold monotonicity: '2' ⊂ '4'
    val smaller = Sampling.deterministicSample(docs, col("doc_id"), "2")
    assert(smaller.exceptAll(s1).isEmpty)
  }

  test("stratified sampling returns exactly n per stratum, stable") {
    val s = Sampling.stratifiedSample(docs, col("lang"), col("doc_id"), n = 7)
    val perStratum = s.groupBy("lang").count().collect()
    assert(perStratum.length == 4 && perStratum.forall(_.getAs[Long]("count") == 7L))
    val again = Sampling.stratifiedSample(docs, col("lang"), col("doc_id"), n = 7)
    assert(s.exceptAll(again).isEmpty)
  }

  test("budgetSample: greedy hash-ordered fill, ≤ one-doc overshoot, stable") {
    def corpus(rows: (Long, String, Int)*) =
      rows.map { case (id, src, n) => (id, Seq.fill(n)("tok").mkString(" "), src) }
        .toDF("doc_id", "text", "source")
    // source s: five 100-token docs, budget 250 → start offsets 0/100/200/
    // 300/400 regardless of hash order (equal sizes) → exactly 3 kept
    // source t: two 200-token docs → starts 0/200, both < 250 → both kept
    // (the second overshoots the budget — by less than one document)
    val d = corpus((1L to 5L).map(i => (i, "s", 100)) :+ (6L, "t", 200) :+ (7L, "t", 200): _*)
    val out = Sampling.budgetSample(d, budget = 250).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs_kept"), r.getAs[Long]("tokens_kept")))).toMap
    assert(out("s") == ((3L, 300L)))
    assert(out("t") == ((2L, 400L)))
    // budget beyond the total keeps everything
    val all = Sampling.budgetSample(d, budget = 100000).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_docs_kept")).toMap
    assert(all == Map("s" -> 5L, "t" -> 2L))
    // pure function of the keys: reruns are row-identical
    val again = Sampling.budgetSample(d, budget = 250)
    assert(Sampling.budgetSample(d, budget = 250).exceptAll(again).isEmpty)
  }

  test("train/val/test split: near-nominal fractions, stable under corpus growth") {
    val split = Sampling.trainValTestSplit(docs, col("doc_id"))
    val byFrac = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1) / 4000.0).toMap
    assert(byFrac.keySet == Set("train", "val", "test"))
    assert(math.abs(byFrac("train") - 204.0 / 256) < 0.03)
    assert(math.abs(byFrac("val") - 26.0 / 256) < 0.02)
    // the contamination guarantee: growing the corpus NEVER reassigns an
    // existing document's split (assignment is a pure function of the key)
    val grown = Sampling.trainValTestSplit(
      (1L to 8000L).map(i => (i, s"lang_${i % 4}")).toDF("doc_id", "lang"),
      col("doc_id"))
    val moved = split.select("doc_id", "split").as("a")
      .join(grown.select(col("doc_id"), col("split").as("split2")), "doc_id")
      .filter(col("split") =!= col("split2"))
    assert(moved.count() == 0L)
  }

  test("trainingOrder: dense 0..n-1 ranks equal to the (hash, id) total order") {
    val ranked = Sampling.trainingOrder(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("train_rank")).toMap
    assert(ranked.size == 4000)
    assert(ranked.values.toSeq.sorted == (0L until 4000L))
    // ranks match the reference total order computed locally
    def h(id: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"graft:$id".getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val expected = (1L to 4000L).sortBy(id => (h(id), id)).zipWithIndex
      .map { case (id, i) => id -> i.toLong }.toMap
    assert(ranked == expected)
    spark.catalog.clearCache()
  }

  test("mixtureWeights: sqrt temperature rebalance, exact 3:1 fixed-point split") {
    // 9 tokens vs 1 token → shares 0.9/0.1; sqrt ratio 3:1, and the 1e9
    // fixed-point floors land exactly on the 3:1 integers → weights .75/.25
    val d = Seq(
      (1L, (1 to 9).map(i => s"t$i").mkString(" "), "big"),
      (2L, "x", "small")).toDF("doc_id", "text", "source")
    val out = Sampling.mixtureWeights(d).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Double]("token_share"), r.getAs[Double]("mix_weight")))).toMap
    assert(out("big") == ((1L, 9L, 0.9, 0.75)))
    assert(out("small") == ((1L, 1L, 0.1, 0.25)))
  }

  test("shardAssignments: balanced to ±1 without a corpus count, stable") {
    val byShard = Sampling.shardAssignments(docs, nShards = 7).collect()
      .groupBy(_.getAs[Long]("shard")).view.mapValues(_.length).toMap
    assert(byShard.keySet == (0L until 7L).toSet)
    assert(byShard.values.max - byShard.values.min <= 1)
    spark.catalog.clearCache()
  }
}
