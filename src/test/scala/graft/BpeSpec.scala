package graft

import graft.operators.Bpe

/** BPE training/apply edge semantics on hand-built corpora. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: (Long, String)*) =
    texts.map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("trainMerges: frequency argmax, merged symbols feed later rounds") {
    // "ccc"×2: round 1 merges (c,c) with 4 pair occurrences; the word
    // becomes [cc, c], so round 2 merges (cc, c) — hierarchy via the
    // round-1 output symbol
    val m = Bpe.trainMerges(docs((1L, "ccc ccc")), numMerges = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(m.toSeq == Seq((1L, "c", "c", "cc", 4L), (2L, "cc", "c", "ccc", 2L)))
  }

  test("trainMerges: tie-break on (count desc, lhs, rhs)") {
    // (a,b) and (b,a) both occur twice in "abab"; lexicographic tie → (a,b)
    val m = Bpe.trainMerges(docs((1L, "abab")), numMerges = 1).collect()
    assert((m(0).getString(1), m(0).getString(2)) == (("a", "b")))
  }

  test("applyMerges: greedy left-to-right single pass per merge") {
    // "aaa" under merge (a,a): greedy left gives [aa, a] — 2 BPE tokens
    val out = Bpe.applyMerges(
      docs((1L, "aaa ab"), (2L, "b")), Seq(("a", "a"), ("a", "b"))).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("n_bpe_tokens")))).toMap
    // doc 1: "aaa" → [aa, a] (2), "ab" → [ab] (1) → 3 BPE tokens
    assert(out(1L) == ((2L, 3L)))
    // doc 2: single char, no merge applies
    assert(out(2L) == ((1L, 1L)))
  }

  test("batched trainMerges is byte-identical to the sequential reference") {
    // mixed corpus: repeated words, ties, symbol collisions ("cc" learned
    // then re-encountered), overlapping-symbol pairs — exercises every
    // batch stop rule against the one-merge-per-round witness
    val d = docs(
      (1L, "ccc ccc abab cdcd efef gh gh gh ij ij"),
      (2L, "the quick brown fox the lazy dog the end"),
      (3L, "aa bb cc aa bb cc aa"),
      (4L, "xyxyxy zwzwzw xy zw"))
    for (n <- Seq(1, 4, 16, 40)) {
      val batched = Bpe.trainMerges(d, numMerges = n)
        .orderBy("merge_rank").collect().map(_.toSeq).toSeq
      val seq = Bpe.trainMergesSequential(d, numMerges = n)
        .orderBy("merge_rank").collect().map(_.toSeq).toSeq
      assert(batched == seq, s"divergence at numMerges=$n")
    }
  }

  test("batched trainMerges matches sequential on ambiguous single-letter corpora") {
    // alphabet {a,b,c} makes merged-string collisions likely (("a","bc") and
    // ("ab","c") both mint "abc") — the case the batch's merged-freshness
    // stop rule exists for
    val words = for { i <- 1 to 3; j <- 0 to 2; k <- 0 to 1 }
      yield "a" * i + "b" * j + "c" * k
    for (mult <- Seq(1, 3)) {
      val text = words.zipWithIndex
        .map { case (w, ix) => (w + " ") * (1 + (ix * mult) % 5) }.mkString(" ")
      val d = docs((1L, text))
      val b = Bpe.trainMerges(d, numMerges = 16)
        .orderBy("merge_rank").collect().map(_.toSeq).toSeq
      val s = Bpe.trainMergesSequential(d, 16)
        .orderBy("merge_rank").collect().map(_.toSeq).toSeq
      assert(b == s, s"divergence at mult=$mult")
    }
  }

  test("256 merges on the sf0.001 documents table in bounded driver rounds") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val t0 = System.nanoTime()
    val m = Bpe.trainMerges(d, numMerges = 256).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    // exhaustion before 256 is legal (vocab-bounded corpus); ranks must be
    // dense from 1 and the learned table monotone-consistent
    assert(m.length >= 64, s"only ${m.length} merges learned")
    assert(m.map(_.getLong(0)).toSeq == (1L to m.length).toSeq)
    assert(secs < 300.0, f"256-merge training took $secs%.1f s")
  }

  test("applyMerges replay matches training segmentation on the train corpus") {
    val d = docs((1L, "ccc ccc cd"))
    val merges = Bpe.trainMerges(d, numMerges = 2).orderBy("merge_rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val out = Bpe.applyMerges(d, merges).collect()
    // "ccc"→[ccc] after both merges; "cd"→[c, d]
    assert(out(0).getAs[Long]("n_bpe_tokens") == 1L + 1L + 2L)
  }
}
