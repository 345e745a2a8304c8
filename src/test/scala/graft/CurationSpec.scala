package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextOps}

/** Round-6 curation operators: chunk-level dedup, PII scrub, canonical-doc
  * selection — edge semantics on hand-built documents.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: (Long, String)*) =
    texts.map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("chunkDedup: cross-doc and intra-doc duplicate chunks, partial tail") {
    val toks = (1 to 8).map(i => s"r$i").mkString(" ")
    val d = docs(
      (1L, "a b c d e f g h i j"), // chunks: "a..h", "i j" (partial tail)
      (2L, "a b c d e f g h"),     // one chunk, equal to doc 1's first
      (3L, (1 to 16).map(i => s"p$i").mkString(" ")), // 2 unique chunks
      (4L, s"$toks $toks"))        // the same chunk twice, intra-doc
    val out = TextOps.chunkDedup(d).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_chunks"), x.getAs[Long]("n_dup_chunks"),
          x.getAs[Double]("dup_chunk_ratio")))).toMap
    assert(out(1L) == ((2L, 1L, 0.5)))
    assert(out(2L) == ((1L, 1L, 1.0)))
    assert(out(3L) == ((2L, 0L, 0.0)))
    assert(out(4L) == ((2L, 2L, 1.0)))
  }

  test("scrubBoilerplate: shared chunks drop, survivors keep document order") {
    val boiler = (1 to 8).map(i => s"nav$i").mkString(" ")
    val d = docs(
      (1L, s"$boiler a b c d e f g h tail one"),  // boiler + unique + tail
      (2L, s"$boiler only shared here"),          // boiler + unique tail
      (3L, boiler))                               // fully boilerplate
    val out = TextOps.scrubBoilerplate(d).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_chunks"), x.getAs[Long]("n_removed_chunks"),
          x.getAs[String]("clean_text")))).toMap
    // doc 1: 3 chunks (boiler, "a..h", "tail one"); boiler removed, the
    // survivors reassemble in original order
    assert(out(1L) == ((3L, 1L, "a b c d e f g h tail one")))
    assert(out(2L) == ((2L, 1L, "only shared here")))
    // fully-boilerplate doc survives as a row with empty clean_text
    assert(out(3L) == ((1L, 1L, "")))
  }

  test("scrubBoilerplate: maxOcc threshold and intra-doc repeats count") {
    val chunk = (1 to 8).map(i => s"c$i").mkString(" ")
    // chunk appears twice inside doc 1 and once in doc 2 → 3 occurrences
    val d = docs((1L, s"$chunk $chunk"), (2L, s"$chunk unique bit"))
    val keep2 = TextOps.scrubBoilerplate(d, maxOcc = 3).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        x.getAs[Long]("n_removed_chunks")).toMap
    assert(keep2 == Map(1L -> 0L, 2L -> 0L)) // under the cap: nothing drops
    val drop = TextOps.scrubBoilerplate(d, maxOcc = 2).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_removed_chunks"),
          x.getAs[String]("clean_text")))).toMap
    assert(drop(1L) == ((2L, "")))
    assert(drop(2L) == ((1L, "unique bit")))
  }

  test("classifierScores: SQL hash path equals the JVM weight derivation, exact label bit") {
    def bucket(tok: String): Int =
      (java.lang.Long.parseLong(md5hex(tok).take(8), 16)
        % TextOps.ClassifierBuckets).toInt
    def raw(toks: Seq[String]): Long =
      toks.map(t => TextOps.ClassifierWeights(bucket(t))).sum
    val t1 = Seq("alpha", "beta", "gamma", "alpha")
    val t2 = Seq("") // empty text → the single empty-string token
    val d = docs((1L, t1.mkString(" ")), (2L, ""))
    val out = TextOps.classifierScores(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("raw_score"),
          r.getAs[Double]("score"), r.getAs[Boolean]("label")))).toMap
    val r1 = raw(t1)
    assert(out(1L) == ((4L, r1,
      BigDecimal(r1 / 4.0).setScale(4, BigDecimal.RoundingMode.HALF_EVEN).toDouble,
      r1 > 0)))
    val r2 = raw(t2)
    assert(out(2L) == ((1L, r2, r2.toDouble, r2 > 0)))
  }

  test("perplexityScores: hand-computed Laplace bigram cross-entropy") {
    // train slice = doc_id % 10 < 3 → only doc 0. Model (lang en):
    // cb: (a,b)=2, (b,a)=1; cu: a=2, b=1; V = |{a,b}| = 2
    val d = docs((0L, "a b a b"), (5L, "z z z"), (6L, "lone"))
    val out = TextOps.perplexityScores(d, threshold = 0.5).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_bigrams"), x.getAs[Double]("cross_entropy"),
          x.getAs[Boolean]("keep")))).toMap
    // doc 0: p(a,b)=(2+1)/(2+2), p(b,a)=(1+1)/(1+2);
    // q = floor(ln(p)·1e7) = −2876821, −4054652 → CE = 9808294/1e7/3
    assert(out(0L) == ((3L, 0.3269, true)))
    // doc 5: (z,z) twice, fully unseen → p = 1/V = 0.5 each
    assert(out(5L) == ((2L, 0.6931, false)))
    // doc 6: one token, no bigrams → absent
    assert(!out.contains(6L) && out.size == 2)
  }

  test("perplexityScores: a language absent from the train slice is not scorable") {
    // doc 15 is the only 'fr' doc and sits outside doc_id%10<3 → no fr
    // model exists; the doc is absent rather than scored against nothing
    val d = Seq(
      (0L, "a b a", "en", "src", 5L),
      (15L, "x y z", "fr", "src", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextOps.perplexityScores(d).collect().map(_.getAs[Long]("doc_id"))
    assert(out.toSeq == Seq(0L))
  }

  test("piiScrub: counts on raw text, sequential redaction, exact hash") {
    val raw = Seq(
      (1L, "reach me at bob.smith@corp.io or 192.168.1.10 or +12025550199 end"),
      (2L, "no pii here, v1.2.3.4 is a version not an address"))
      .toDF("doc_id", "raw")
    val r = TextOps.piiScrub(raw).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Long]("n_emails") == 1L)
    assert(r(1L).getAs[Long]("n_ipv4") == 1L)
    assert(r(1L).getAs[Long]("n_phones") == 1L)
    val redacted = "reach me at [EMAIL] or [IP] or [PHONE] end"
    assert(r(1L).getAs[String]("redacted_hash") == md5hex(redacted))
    assert(r(1L).getAs[Long]("n_chars_redacted") == redacted.length.toLong)
    // "v1.2.3.4": no word boundary between 'v' and '1', and no 4-octet run
    // starts at a boundary — the version string must survive unredacted
    assert(r(2L).getAs[Long]("n_emails") + r(2L).getAs[Long]("n_ipv4")
      + r(2L).getAs[Long]("n_phones") == 0L)
    assert(r(2L).getAs[String]("redacted_hash")
      == md5hex("no pii here, v1.2.3.4 is a version not an address"))
  }

  test("syntheticPiiDocs: residue classes inject varied, deterministic PII") {
    val d = docs((60L, "base text"), (7L, "other text"))
    val out = TextOps.piiScrub(TextOps.syntheticPiiDocs(d)).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    // 60 ≡ 0 mod 3, 4, and 5 → one of each kind appended
    assert(out(60L).getAs[Long]("n_emails") == 1L)
    assert(out(60L).getAs[Long]("n_ipv4") == 1L)
    assert(out(60L).getAs[Long]("n_phones") == 1L)
    // 7 hits no residue class → nothing appended, nothing found
    assert(out(7L).getAs[Long]("n_emails") == 0L)
    assert(out(7L).getAs[Long]("n_ipv4") == 0L)
    assert(out(7L).getAs[Long]("n_phones") == 0L)
  }

  // ---- corpusPipeline end-to-end fixture ----
  //
  // A pure-JVM (no-Spark) reimplementation of every pipeline stage serves
  // as an independent witness for the composed manifest: the SAME documents
  // flow through Corpus.corpusPipeline and through this plain-Scala model,
  // and the (shard, bin) manifests must agree exactly. A wiring regression
  // in ANY stage (gate order, semi-join target, split filter, budget rule,
  // packing window) diverges the two.

  private def r4(d: Double): Double =
    BigDecimal.valueOf(d).setScale(4, BigDecimal.RoundingMode.HALF_EVEN).toDouble

  private def ws(t: String): Seq[String] = t.split("\\s+").toSeq

  private def modelQuality(t: String): Double = {
    val n = t.length
    val w = ws(t)
    val alpha = t.count(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))
    val punct = t.count(c => !((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
      || (c >= '0' && c <= '9') || c.isWhitespace))
    val nStop = w.count(TextOps.stopwords.contains)
    r4(r4(alpha.toDouble / n) * 0.4 + (1.0 - r4(punct.toDouble / n)) * 0.3
      + r4(nStop.toDouble / w.size) * 0.2 + math.min(1.0, w.size / 100.0) * 0.1)
  }

  private def modelClassifierKeep(t: String): Boolean =
    ws(t).map { tok =>
      val b = (java.lang.Long.parseLong(md5hex(tok).take(8), 16)
        % TextOps.ClassifierBuckets).toInt
      TextOps.ClassifierWeights(b)
    }.sum > 0L

  private def modelSplit(id: Long): String = {
    val h = md5hex(id.toString)
    if (h < "cc") "train" else if (h < "e6") "val" else "test"
  }

  /** Batch dedup model: min id per identical text (the fixture plants no
    * LSH near-dups — texts are structurally distinct).
    */
  private def batchDedup(clean: Seq[(Long, String, String)]): Seq[(Long, String, String)] =
    clean.groupBy(_._2).values.map(_.minBy(_._1)).toSeq.sortBy(_._1)

  /** Arrival-order dedup model (nWaves waves by id % nWaves): a text kept
    * by an earlier wave drops later copies (first ARRIVAL wins, even when
    * the later copy has the smaller id); within a wave, min id wins.
    */
  private def ingestDedup(nWaves: Int)(
      clean: Seq[(Long, String, String)]): Seq[(Long, String, String)] = {
    var seen = Set.empty[String]
    val out = Seq.newBuilder[(Long, String, String)]
    for (w <- 0 until nWaves) {
      val wave = clean.filter(_._1 % nWaves == w)
        .groupBy(_._2).values.map(_.minBy(_._1))
        .filter(d => !seen.contains(d._2)).toSeq.sortBy(_._1)
      out ++= wave
      seen ++= wave.map(_._2)
    }
    out.result()
  }

  /** Every stage boundary of the pure-Scala model — the funnel test counts
    * these; [[modelManifest]] packs the last.
    */
  private case class ModelStages(clean: Seq[(Long, String, String)],
                                 deduped: Seq[(Long, String, String)],
                                 red: Seq[(Long, String, String)],
                                 gated: Seq[(Long, String, String)],
                                 train: Seq[(Long, String, String)],
                                 decon: Seq[(Long, String, String)],
                                 kept: Seq[(Long, Long)])

  private def modelStages(input: Seq[(Long, String, String)], flagAt: Double,
                          totalBudget: Long,
                          dedup: Seq[(Long, String, String)] => Seq[(Long, String, String)])
      : ModelStages = {
    // stage 1: quality gate -> dedup survivorship (batch or arrival-order)
    val clean = input.filter { case (_, t, _) => modelQuality(t) >= 0.70 }
    val deduped = dedup(clean)
    // stage 2: boilerplate scrub (8-token non-overlapping chunks, maxOcc 1)
    def chunks(t: String) = ws(t).grouped(8).map(_.mkString(" ")).toSeq
    val occ = deduped.flatMap(d => chunks(d._2))
      .groupBy(identity).view.mapValues(_.size).toMap
    val red = deduped
      .map { case (id, t, src) => (id, chunks(t).filter(occ(_) <= 1).mkString(" "), src) }
      .filter(_._2.nonEmpty) // stage 3 (PII redact) is identity on the fixture
    // stage 4: perplexity gate neutralized by threshold; it still requires a
    // trained LM slice for the language and >= 2 tokens (no bigrams otherwise)
    assert(red.exists(_._1 % 10 < 3), "fixture must include an LM train-slice doc")
    val gated = red.filter(d => ws(d._2).size >= 2)
      .filter(d => modelClassifierKeep(d._2))
    // stage 5: contamination over the gated set, then the explicit train filter
    def shingles(t: String): Seq[String] = {
      val w = ws(t)
      if (w.size < 8) Seq.empty else w.sliding(8).map(_.mkString(" ")).toSeq.distinct
    }
    val held = gated.filter(d => modelSplit(d._1) != "train")
      .flatMap(d => shingles(d._2)).toSet
    val train = gated.filter(d => modelSplit(d._1) == "train")
    val decon = train.filter { d =>
      val sh = shingles(d._2)
      sh.isEmpty || (sh.count(held.contains).toDouble / sh.size) < flagAt
    }
    // stage 6: mixture budgets + hash-order prefix fill
    val nTok = decon.map { case (id, t, src) =>
      (id, src, TextOps.tokenPattern.r.findAllIn(t).size.toLong)
    }
    val srcTok = nTok.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val total = srcTok.values.sum
    val q = srcTok.view.mapValues(st =>
      math.floor(math.sqrt(st.toDouble / total) * 1.0e9).toLong).toMap
    val denom = q.values.sum
    val budget = q.view.mapValues(qq =>
      math.floor(r4(qq.toDouble / denom) * totalBudget).toLong).toMap
    val kept = nTok.groupBy(_._2).toSeq.flatMap { case (src, docs) =>
      var cum = 0L
      docs.sortBy { case (id, _, _) => (md5hex(id.toString), id) }.flatMap {
        case (id, _, n) =>
          cum += n
          if (cum - n < budget(src)) Some((id, n)) else None
      }
    }
    ModelStages(clean, deduped, red, gated, train, decon, kept)
  }

  /** The full pure-Scala pipeline model → (shard, bin) -> (n_docs, tokens). */
  private def modelManifest(input: Seq[(Long, String, String)], flagAt: Double,
                            totalBudget: Long, nShards: Int, seqBudget: Long,
                            dedup: Seq[(Long, String, String)] => Seq[(Long, String, String)] = batchDedup)
      : Map[(Long, Long), (Long, Long)] = {
    val kept = modelStages(input, flagAt, totalBudget, dedup).kept
    // stage 7: global seeded order -> round-robin shards -> packed bins
    val ranked = kept.sortBy { case (id, _) => (md5hex(s"graft:$id"), id) }
      .zipWithIndex.map { case ((id, n), rk) => (rk.toLong % nShards, rk.toLong, n) }
    ranked.groupBy(_._1).toSeq.flatMap { case (shard, docs) =>
      var cum = 0L
      docs.sortBy(_._2).map { case (_, _, n) =>
        cum += n
        (shard, (cum - n) / seqBudget, n)
      }
    }.groupBy(t => (t._1, t._2)).view
      .mapValues(g => (g.size.toLong, g.map(_._3).sum)).toMap
  }

  /** The shared end-to-end pipeline fixture: 8 train docs (a contamination
    * target, an exact-dup pair — min id survives, four clean docs, a junk
    * doc that fails the quality gate) + 1 val doc sharing one sliding
    * 8-token shingle with the contamination target (1/17 ≈ 0.059 overlap).
    * Ids picked by split-hash so the fixture controls train/val membership;
    * texts lean on positively-classifier-weighted words (of/it/a/who/today)
    * so the hashed linear gate keeps them.
    */
  private lazy val pipelineFixtureRows: Seq[(Long, String, String)] = {
    val trainIds = (1L to 100L).filter(modelSplit(_) == "train")
      .filter(_ % 10 < 3).take(4) ++
      (1L to 100L).filter(modelSplit(_) == "train").filter(_ % 10 >= 3).take(4)
    val valId = (1L to 100L).find(modelSplit(_) == "val").get
    val dupText = "it is of a way of it a cat who can sleep far today of it"
    val texts = Seq(
      "of alpha it beta a gamma of delta it epsilon a zeta of eta it " +
        "theta a iota of kappa it lam a mu",                            // contamination target
      dupText,                                                          // exact-dup pair,
      dupText,                                                          //   min id survives
      "a bird of it a hand of it a man who are wise today of it",
      "of it a dog of it a tree of it a day far mainly today",
      "it of a sun of it a park of it a fact who stays today",
      "a way of it a man of it a cat who sleep mainly far today",
      "@@@@ #### %%%% ^^^^ &&&& ****")                                  // fails the quality gate
    val ids = trainIds.take(texts.size)
    assert(ids.size == texts.size, "fixture needs 8 train ids")
    // val doc: contains the target's tokens 5..12 as a contiguous run that
    // straddles its chunk boundary, so the scrub keeps both but the sliding
    // 8-token shingle is shared
    val vText = "it of a a gamma of delta it epsilon a zeta of it a who today"
    ids.zip(texts).zipWithIndex.map { case ((id, t), i) =>
      (id, t, if (i % 2 == 0) "web" else "books")
    } :+ ((valId, vText, "web"))
  }

  private def pipelineFixtureDf =
    pipelineFixtureRows.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("corpusPipeline end-to-end equals the pure-Scala stage model") {
    val rows = pipelineFixtureRows
    val df = pipelineFixtureDf
    // model sanity: the fixture exercises what it claims to
    assert(modelQuality(rows(7)._2) < 0.70, "junk doc must fail the gate")
    assert(modelQuality(rows.head._2) >= 0.70 && modelQuality(rows.last._2) >= 0.70)
    for (flagAt <- Seq(0.05, 0.2)) {
      val expected = modelManifest(rows, flagAt, 10000000L, 2, 10L)
      val got = operators.Corpus.corpusPipeline(df,
        perplexityThreshold = 1.0e9, flagAt = flagAt,
        totalBudget = 10000000L, nShards = 2, seqBudget = 10L)
        .collect()
        .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("bin")) ->
          ((r.getAs[Long]("n_docs"), r.getAs[Long]("bin_tokens")))).toMap
      assert(got == expected, s"manifest divergence at flagAt=$flagAt")
      assert(got.nonEmpty, "fixture must produce a non-empty manifest")
    }
    // the two thresholds must actually differ: A is flagged only at 0.05
    val tight = modelManifest(rows, 0.05, 10000000L, 2, 10L)
    val loose = modelManifest(rows, 0.2, 10000000L, 2, 10L)
    assert(tight.values.map(_._2).sum < loose.values.map(_._2).sum,
      "contamination flag must drop doc A at the tight threshold")
    // pipelineTail persists per invocation; don't leak into later suites
    spark.catalog.clearCache()
  }

  test("pipelineFunnel counts every stage boundary of the same build") {
    val rows = pipelineFixtureRows
    val m = modelStages(rows, flagAt = 0.2, totalBudget = 10000000L, batchDedup)
    val expected = Seq[(Long, String, Long)](
      (0L, "raw", rows.size.toLong),
      (1L, "quality_gate", m.clean.size.toLong),
      (2L, "exact_dedup", m.deduped.size.toLong),
      (3L, "near_dedup", m.deduped.size.toLong), // fixture plants no near-dups
      (4L, "boilerplate_scrub", m.red.size.toLong),
      (5L, "model_gates", m.gated.size.toLong),
      (6L, "train_split", m.train.size.toLong),
      (7L, "decontaminated", m.decon.size.toLong),
      (8L, "budget_kept", m.kept.size.toLong))
    val got = operators.Corpus.pipelineFunnel(pipelineFixtureDf,
      perplexityThreshold = 1.0e9, flagAt = 0.2, totalBudget = 10000000L,
      nShards = 2, seqBudget = 10L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      .sortBy(_._1)
    assert(got == expected)
    // the funnel must actually narrow where the fixture says it does
    assert(m.clean.size < rows.size && m.deduped.size < m.clean.size)
    spark.catalog.clearCache()
  }

  test("pipelineFunnelIncremental counts the arrival-order boundaries") {
    val rows = pipelineFixtureRows
    // the same stage model under the arrival-order dedup rule: stage 2 is
    // the exact first-arrival-wins pre-dedup, stage 3 the greedy ingest
    // fold — identical counts on this fixture (no near-dups planted), but
    // WHICH dup id survives differs from the batch min-id rule, so the
    // downstream split membership (and its counts) can differ too
    val m = modelStages(rows, flagAt = 0.2, totalBudget = 10000000L, ingestDedup(3))
    val expected = Seq[(Long, String, Long)](
      (0L, "raw", rows.size.toLong),
      (1L, "quality_gate", m.clean.size.toLong),
      (2L, "exact_dedup", m.deduped.size.toLong),
      (3L, "near_dedup", m.deduped.size.toLong),
      (4L, "boilerplate_scrub", m.red.size.toLong),
      (5L, "model_gates", m.gated.size.toLong),
      (6L, "train_split", m.train.size.toLong),
      (7L, "decontaminated", m.decon.size.toLong),
      (8L, "budget_kept", m.kept.size.toLong))
    val got = operators.Corpus.pipelineFunnelIncremental(pipelineFixtureDf,
      nWaves = 3, perplexityThreshold = 1.0e9, flagAt = 0.2,
      totalBudget = 10000000L, nShards = 2, seqBudget = 10L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      .sortBy(_._1)
    assert(got == expected)
    spark.catalog.clearCache()
  }

  test("corpusPipelineIncremental: first-arrival-wins vs the batch min-id rule") {
    // dup pair chosen so the LARGER id lands in an EARLIER wave (id % 3):
    // the batch build keeps the min id, the arrival-order build keeps the
    // earlier arrival — the one observable contract difference
    val trainIds = (1L to 200L).filter(modelSplit(_) == "train")
    val dupA = trainIds.find(_ % 3 == 2).get          // later wave
    val dupB = trainIds.find(i => i % 3 == 0 && i > dupA).get // earlier wave, larger id
    // shingle-less exact dup pair (2 tokens < ShingleK = 3): null LSH bands
    // never co-bucket, so only the explicit exact pre-dedup catches it —
    // without that stage BOTH copies reach the boilerplate scrub, the
    // shared chunk counts twice corpus-wide, and both docs scrub to empty.
    // Again earlier wave gets the larger id, so the two rules disagree.
    val tinyText = Seq("it of", "of it", "a it", "it a", "of a")
      .find(t => modelQuality(t) >= 0.70 && modelClassifierKeep(t))
      .getOrElse(fail("no 2-token text passes the quality + classifier gates"))
    val tinyLate = trainIds.find(i => i % 3 == 2 && i != dupA).get
    val tinyEarly = trainIds.find(i => i % 3 == 1 && i > tinyLate).get
    val others = trainIds
      .filter(i => !Set(dupA, dupB, tinyLate, tinyEarly).contains(i))
      .filter(_ % 10 < 3).take(3)
    val dupText = "it is of a way of it a cat who can sleep far today of it"
    val rows = Seq(
      (dupA, dupText, "web"), (dupB, dupText, "web"),
      (tinyEarly, tinyText, "web"), (tinyLate, tinyText, "web"),
      (others(0), "a bird of it a hand of it a man who are wise today of it", "web"),
      (others(1), "of it a dog of it a tree of it a day far mainly today", "books"),
      (others(2), "it of a sun of it a park of it a fact who stays today", "books"))
    val df = rows.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // model sanity: the two survivorship rules genuinely pick different docs
    val keptBatch = batchDedup(rows).map(_._1).toSet
    val keptInc = ingestDedup(3)(rows).map(_._1).toSet
    assert(keptBatch.contains(dupA) && !keptBatch.contains(dupB))
    assert(keptInc.contains(dupB) && !keptInc.contains(dupA))
    assert(keptBatch.contains(tinyLate) && !keptBatch.contains(tinyEarly))
    assert(keptInc.contains(tinyEarly) && !keptInc.contains(tinyLate))
    for ((dedup, got) <- Seq(
      (batchDedup _, operators.Corpus.corpusPipeline(df,
        perplexityThreshold = 1.0e9, flagAt = 1.5,
        totalBudget = 10000000L, nShards = 2, seqBudget = 10L)),
      (ingestDedup(3) _, operators.Corpus.corpusPipelineIncremental(df,
        nWaves = 3, perplexityThreshold = 1.0e9, flagAt = 1.5,
        totalBudget = 10000000L, nShards = 2, seqBudget = 10L)))) {
      val expected = modelManifest(rows, 1.5, 10000000L, 2, 10L, dedup)
      val actual = got.collect()
        .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("bin")) ->
          ((r.getAs[Long]("n_docs"), r.getAs[Long]("bin_tokens")))).toMap
      assert(actual == expected && actual.nonEmpty)
    }
    spark.catalog.clearCache()
  }

  test("corpusPipeline: nShards must be at least 1") {
    val d = docs((1L, "the a of and is in to it that"))
    intercept[IllegalArgumentException] {
      operators.Corpus.corpusPipeline(d, nShards = 0)
    }
  }

  test("canonicalDocs: quality argmax beats the min-id rule; ties → min id") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    // near-dup of base with two tokens turned into pure punctuation — same
    // shingle mass (jaccard well above 0.5) but a lower quality score
    val worse = (1 to 40)
      .map(i => if (i == 20 || i == 21) "@@@@" else s"w$i").mkString(" ")
    // worse doc gets the LOWER id: a min-id rule would pick 1; quality picks 2
    val d = docs((1L, worse), (2L, base), (10L, base), (11L, base))
    val out = Dedup.canonicalDocs(d).collect()
      .map(x => (x.getAs[Long]("component"),
        x.getAs[Long]("canonical_doc"), x.getAs[Long]("n_members")))
    // components: {1,2} canonical 2 (higher quality), {10,11} canonical 10
    // (identical text → equal quality → tie falls to min doc_id)... unless
    // all four near-dup into ONE component (10/11 duplicate base exactly, so
    // they pair with 2 as well) — then the canonical is the best-quality
    // member with the lowest id among {2,10,11}
    assert(out.length == 1)
    val (_, canonical, n) = out.head
    assert(n == 4L)
    assert(canonical == 2L) // highest quality (base text), lowest id of those
  }
}
