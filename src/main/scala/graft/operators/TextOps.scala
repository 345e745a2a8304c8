package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline over the
  * `documents` table: token counting, quality scoring, language ID (stopword
  * heuristic), and document fingerprinting. The reference has no text surface
  * — these are the pipeline-completeness operators the builder prompt
  * requires, designed map-side only (no shuffle: every metric is a per-row
  * expression, so they scale linearly with input splits).
  *
  * Parity notes (mirrored in [[graft.Oracles]]): DuckDB `regexp_replace`
  * needs the `'g'` flag to match Spark's replace-all; 4-dp rounding is
  * half-even on both sides (`bround` / `round_even`).
  */
object TextOps {

  /** Whitespace tokens of `text`.
    *
    * EVALUATION CONTRACT: never pass this expression into a higher-order
    * lambda ([[Shingles.shingles]]'s `slice`, a bigram `element_at`, a chunk
    * `slice`) — a lambda body re-evaluates every captured non-lambda
    * subexpression PER ELEMENT, so the split becomes O(tokens) per element =
    * quadratic per document (measured 40–115 s for 500 docs × 2000 tokens
    * across the shingle family; linear after staging). Stage the token
    * array in a parent projection first and hand the lambda a bound column
    * reference; CollapseProject keeps the staged alias because the split is
    * non-cheap and multiply-referenced.
    */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** BPE-ish token pattern: letter runs, digit runs, single other glyphs. */
  val tokenPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

  /** Token counting: whitespace tokens + regex (BPE-ish) tokens. */
  def tokenCount(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_ws_tokens"),
      size(regexp_extract_all(col("text"), lit(tokenPattern), lit(0)))
        .cast("long").as("n_re_tokens"))

  val stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "is", "in", "to", "it", "that")

  /** Composite quality score as a pure per-row column — usable inline as a
    * gate (see [[Corpus]]) without any join against a metrics frame.
    * Zero-length guard: ANSI division would throw; ratios (and the score,
    * via null propagation) are NULL for empty texts on both engines.
    */
  def qualityScore(t: Column): Column = {
    val n = length(t)
    val w = tokens(t)
    val nWords = size(w).cast("long")
    val alpha = length(regexp_replace(t, "[^a-zA-Z]", ""))
    val punct = length(regexp_replace(t, "[a-zA-Z0-9\\s]", ""))
    val nStop = size(filter(w, x => x.isInCollection(stopwords))).cast("long")
    def ratio(num: Column): Column =
      when(n > 0, bround(num.cast("double") / n, 4))
    bround(
      ratio(alpha) * 0.4 + (lit(1.0) - ratio(punct)) * 0.3
        + bround(nStop.cast("double") / nWords, 4) * 0.2
        + least(lit(1.0), nWords.cast("double") / 100) * 0.1, 4)
  }

  /** Quality scoring: length, word stats, punctuation / alpha / stopword
    * ratios, and the composite [[qualityScore]] — all 4-dp half-even.
    */
  def textQuality(docs: DataFrame): DataFrame = {
    val t = col("text")
    // parts staged once (the tokens() evaluation contract, constant-factor
    // form): inlined, the split and the alpha/punct regexes each re-ran per
    // consuming output column — ~8 tokenizations per row via the
    // quality_score recompute. Values and rounding identical: the staged
    // columns are the exact subexpressions the inline form evaluated.
    val n = col("__n")
    val nWords = col("__nw")
    def ratio(num: Column): Column =
      when(n > 0, bround(num.cast("double") / n, 4))
    docs.select(
      col("doc_id"),
      length(t).as("__n"),
      tokens(t).as("__toks"),
      length(regexp_replace(t, "[^a-zA-Z]", "")).as("__alpha"),
      length(regexp_replace(t, "[a-zA-Z0-9\\s]", "")).as("__punct"),
      length(regexp_replace(t, "\\s", "")).as("__nonspace"))
    .select(
      col("doc_id"), col("__n"), col("__alpha"), col("__punct"),
      col("__nonspace"),
      size(col("__toks")).cast("long").as("__nw"),
      size(filter(col("__toks"), x => x.isInCollection(stopwords)))
        .cast("long").as("__nstop"))
    .select(
      col("doc_id"),
      n.cast("long").as("n_chars"),
      nWords.as("n_words"),
      bround(col("__nonspace").cast("double") / nWords, 4).as("mean_word_len"),
      ratio(col("__alpha")).as("alpha_ratio"),
      ratio(col("__punct")).as("punct_ratio"),
      bround(col("__nstop").cast("double") / nWords, 4).as("stopword_ratio"),
      bround(
        ratio(col("__alpha")) * 0.4 + (lit(1.0) - ratio(col("__punct"))) * 0.3
          + bround(col("__nstop").cast("double") / nWords, 4) * 0.2
          + least(lit(1.0), nWords.cast("double") / 100) * 0.1, 4)
        .as("quality_score"))
  }

  /** Per-language marker stopwords for the n-gram/stopword language-ID
    * heuristic. Priority order (ties / all-zero → earlier wins, 'und' if no
    * marker hits at all).
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "y", "es"))

  /** Language ID: argmax of marker-stopword hit counts, first-listed language
    * wins ties, 'und' when nothing matches.
    */
  def langId(docs: DataFrame): DataFrame = {
    // staged in two layers (the tokens() evaluation contract, constant-
    // factor form): the split feeds one marker filter per language, and
    // each score feeds its output column + the greatest() + the argmax
    // when-chain — inlined, the tokenize ran ~20× per row
    val scores = langMarkers.map { case (lang, markers) =>
      lang -> size(filter(col("__toks"), x => x.isInCollection(markers)))
        .cast("long")
    }
    val scoreRefs = langMarkers.map { case (lang, _) => col(s"score_$lang") }
    val maxScore = greatest(scoreRefs: _*)
    val predicted = langMarkers.map(_._1).zip(scoreRefs)
      .foldRight(lit("und")) { case ((lang, s), acc) =>
        when(s === maxScore && maxScore > 0, lit(lang)).otherwise(acc)
      }
    // foldRight + when-chain → first language in priority order that attains
    // the max wins (en > de > fr > es), mirroring the oracle's CASE order.
    docs.select(col("doc_id"), tokens(col("text")).as("__toks"))
      .select(col("doc_id") +:
        scores.map { case (l, s) => s.as(s"score_$l") }: _*)
      .select(col("*"), predicted.as("predicted_lang"))
  }

  /** Percentile length statistics per language (exact interpolated
    * percentiles, 4-dp rounded — the two engines' interpolation formulas can
    * differ in the last float bits).
    */
  def lengthPercentiles(docs: DataFrame): DataFrame =
    docs.groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        bround(percentile(col("n_chars"), lit(0.5)), 4).as("p50_chars"),
        bround(percentile(col("n_chars"), lit(0.9)), 4).as("p90_chars"))

  /** TF-IDF top terms per document: tf = term count / doc length, idf =
    * ln(N / docs-with-term), top `k` by (score desc, term). ln is
    * correctly-rounded on both engines (verified), score 4-dp rounded.
    * Shape at scale: one explode + two keyed aggregations + a broadcast of
    * the (small) document-frequency table's scalar N — no quadratic step.
    */
  def tfidfTopTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(tokens(col("text"))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("doc_len",
        sum(col("cnt")).over(Window.partitionBy(col("doc_id"))))
    val df = toks.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("n_docs_with"))
    val n = docs.agg(count(lit(1)).cast("double").as("n_total"))
    val scored = tf.join(df, "term").crossJoin(broadcast(n))
      .withColumn("score", bround(
        (col("cnt").cast("double") / col("doc_len"))
          * log(col("n_total") / col("n_docs_with")), 4))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    scored.withColumn("term_rank", row_number().over(w).cast("long"))
      .filter(col("term_rank") <= k)
      .select(col("doc_id"), col("term_rank"), col("term"), col("score"))
  }

  /** The fixed query set of the registered BM25 query — common testdata
    * vocabulary, two terms each (multi-term scoring exercises the per-query
    * sum).
    */
  val Bm25Queries: Seq[(Long, Seq[String])] = Seq(
    0L -> Seq("spark", "join"),
    1L -> Seq("data", "stream"),
    2L -> Seq("hash", "scan"))

  /** BM25 ranked retrieval (Okapi, k1=1.2 b=0.75): top-`k` documents per
    * query, score = Σ_terms idf·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) with
    * idf = ln(1 + (N−df+0.5)/(df+0.5)), 4-dp rounded (ln is
    * correctly-rounded on both engines — same contract as
    * [[tfidfTopTerms]]). Ranking ties break on doc_id, and the rank orders
    * by the ROUNDED score, so cross-engine low-bit sum differences can
    * never reorder the top-k.
    *
    * Shape at scale — the inverted-index-free scoring pass: only tokens
    * matching a query term leave the scan stage (the `isin` prune runs
    * map-side), so the (doc, term) tf aggregate shuffles hits, not the
    * corpus; document frequencies and corpus stats are metadata-sized
    * broadcasts; the per-doc length join touches only scoring candidates.
    */
  def bm25TopDocs(docs: DataFrame,
                  queries: Seq[(Long, Seq[String])] = Bm25Queries,
                  k: Int = 5, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val session = docs.sparkSession
    import session.implicits._
    val qterms = queries.flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("query_id", "term")
    val allTerms = queries.flatMap(_._2).distinct
    val lens = docs.select(col("doc_id"),
      size(tokens(col("text"))).cast("double").as("dl"))
    val stats = lens.agg(count(lit(1)).cast("double").as("n_total"),
      (sum(col("dl")) / count(lit(1))).as("avgdl"))
    val tf = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .filter(col("term").isin(allTerms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    val scored = tf
      .join(broadcast(dfreq), "term")
      .join(lens, "doc_id")
      .crossJoin(broadcast(stats))
      .join(broadcast(qterms), "term")
      .withColumn("idf",
        log(lit(1.0) + (col("n_total") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      // (k1 + 1) and (1 − b) as ARITHMETIC on both engines, not precomputed
      // Scala literals: 1.2 + 1.0 rounds differently than the decimal "2.2"
      // parses, and the oracle writes the same expressions textually
      .withColumn("tnorm", col("tf") * (lit(k1) + lit(1.0))
        / (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(bround(sum(col("idf") * col("tnorm")), 4).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"))
  }

  /** Document fingerprinting: full-content md5 plus the minimum 3-word
    * shingle hash (a 1-hash winnowing fingerprint — robust to doc reordering
    * at the granularity of shingles).
    *
    * Two-step select on purpose: `sh` is consumed twice, and CollapseProject
    * declines to merge projects when a non-cheap expression (the shingle HOF
    * chain) is referenced more than once — so the shingle array is built once
    * per row here, versus twice when both consumers inline it in one select.
    */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      md5(col("text")).as("content_hash"),
      tokens(col("text")).as("__toks"))
    .select(
      col("doc_id"),
      col("content_hash"),
      Shingles.shingles(col("__toks"), 3).as("__sh"))
    .select(
      col("doc_id"),
      col("content_hash"),
      array_min(transform(col("__sh"), s => md5(s))).as("min_shingle_hash"),
      size(array_distinct(col("__sh"))).cast("long").as("n_distinct_shingles"))

  /** Gopher-style intra-document repetition signals (Rae et al. 2021 §A1.1,
    * adapted to token n-grams): per document, the occurrence count of the
    * most frequent bigram and the number of trigram occurrences belonging to
    * duplicated trigrams, plus the denominators — integers only, so the
    * oracle hash-compare is exact. The downstream filter (e.g. drop when
    * top_bigram_count/n_bigrams > 0.2) is a trivial derived predicate.
    *
    * Scale shape: entirely map-side — the per-row sort + run-length walk
    * replaces the explode → groupBy(doc_id, ngram) → groupBy(doc_id) double
    * shuffle the naive form needs; cost is O(tokens log tokens) per row,
    * shuffle ZERO. The multiplicity kernel is the codegen'd
    * [[graft.functions.RunLengthStats]] expression — the equivalent
    * `aggregate()` struct-fold was measured minutes-cold / seconds-warm
    * under interpreted lambda dispatch. Staged selects keep each shingle
    * array built once per row (the q_doc_fingerprint lesson).
    */
  def repetitionStats(docs: DataFrame): DataFrame = {
    graft.functions.TextExpressions.register(docs.sparkSession)
    def runStats(c: Column) = call_function("graft_run_stats", c)
    docs.select(col("doc_id"), tokens(col("text")).as("__toks"))
    .select(
      col("doc_id"),
      Shingles.shingles(col("__toks"), 2).as("__bg"),
      Shingles.shingles(col("__toks"), 3).as("__tg"))
    .select(
      col("doc_id"),
      size(col("__bg")).cast("long").as("n_bigrams"),
      runStats(col("__bg")).as("__bgstats"),
      size(col("__tg")).cast("long").as("n_trigrams"),
      runStats(col("__tg")).as("__tgstats"))
    .select(
      col("doc_id"),
      col("n_bigrams"),
      col("__bgstats.max_run").as("top_bigram_count"),
      col("n_trigrams"),
      (col("n_trigrams") - col("__tgstats.singletons"))
        .as("dup_trigram_tokens"))
  }

  /** Chunk-granularity (paragraph-style) duplication stats — the Dolma/CCNet
    * "duplicate paragraph" signal adapted to this corpus's newline-free
    * documents: text is cut into non-overlapping `k`-token chunks and a
    * chunk occurrence counts as duplicated when its text appears more than
    * once in the WHOLE corpus (cross-doc boilerplate and intra-doc repeats
    * both count — complementary to [[repetitionStats]], which is strictly
    * intra-document). Output per doc: chunk count, duplicated-occurrence
    * count, and the 4-dp duplication ratio the downstream filter gates on.
    *
    * Scale shape: explode → one count-window keyed on the chunk md5 (single
    * shuffle, no join-back — the [[Corpus]] exact-dedup lesson) → one doc_id
    * agg. Shuffle volume is bounded by chunk count × 32-byte hash, not by
    * text bytes; genuinely hot chunks (empty boilerplate) are real data
    * skew that AQE splits, not a plan defect.
    */
  def chunkDedup(docs: DataFrame, k: Int = 8): DataFrame = {
    val chunks = chunkExplode(docs, k, Nil).select(col("doc_id"), col("chunk"))
    val occ = chunks.withColumn("__n",
      count(lit(1)).over(Window.partitionBy(md5(col("chunk")))))
    occ.groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("__n") > 1, 1L).otherwise(0L)).as("n_dup_chunks"))
      .withColumn("dup_chunk_ratio",
        bround(col("n_dup_chunks").cast("double") / col("n_chunks"), 4))
  }

  /** Feature-hash bucket count and the md5-derived integer weight table of
    * [[classifierScores]]. Weights are INTEGERS in [−15, 15] so every
    * per-document accumulation is exact long arithmetic — no float fold,
    * no ordering concern, bit-free cross-engine parity. The md5 derivation
    * stands in for offline training (the inference seam is what runs at
    * corpus scale; a trained model would just swap these literals).
    */
  val ClassifierBuckets = 64
  lazy val ClassifierWeights: Seq[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until ClassifierBuckets).map { b =>
      val h = md.digest(s"w:$b".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h, 16) % 31 - 15
    }
  }

  /** fastText-style hashed linear classifier INFERENCE (Joulin et al. 2017,
    * the quality-filter form used by GPT-3/LLaMA-style curation): each
    * token hashes into one of [[ClassifierBuckets]] feature buckets
    * (first 8 md5 hex chars mod buckets — DuckDB parses the same hex), the
    * document's raw score is Σ w[bucket(tok)] over token OCCURRENCES, and
    * the classifier emits the length-normalized score plus the keep label.
    * Integer weights make raw exact; `label` compares the LONG raw score
    * (not the rounded double), so the decision bit is arithmetic-exact.
    *
    * Scale shape: weights are a literal array (zero broadcast, zero join —
    * the lookup is an `element_at` in the scan stage), so the whole
    * operator is one explode + one doc-keyed aggregate. Inference cost is
    * O(corpus tokens) with no model-side shuffle at any corpus size.
    */
  def classifierScores(docs: DataFrame): DataFrame = {
    val wts = typedlit(ClassifierWeights)
    val bucket = conv(substring(md5(col("tok")), 1, 8), 16, 10)
      .cast("long") % ClassifierBuckets
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .select(col("doc_id"),
        element_at(wts, (bucket + 1).cast("int")).as("__w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("__w")).as("raw_score"))
      .select(col("doc_id"), col("n_tokens"), col("raw_score"),
        bround(col("raw_score").cast("double") / col("n_tokens"), 4).as("score"),
        (col("raw_score") > 0L).as("label"))
  }

  /** CCNet-style language-model perplexity filtering (Wenzek et al. 2020
    * §4.3, with an add-one bigram LM standing in for KenLM): a per-language
    * bigram model is trained on a deterministic REFERENCE slice
    * (`doc_id % trainMod < trainLt` — the stand-in for CCNet's Wikipedia),
    * then EVERY document is scored by its per-bigram cross-entropy under
    * that model,
    *   H(d) = −(1/n) Σ ln((c(w1,w2) + 1)/(c(w1·) + V)),
    * with V = the language's train-slice vocabulary and c(w1·) the bigram
    * continuation total (so unseen (w1,w2) backs off to 1/(c(w1·)+V) and a
    * fully-unseen w1 to 1/V — plain Laplace). Documents with fewer than two
    * tokens have no bigrams and are absent, same contract as the shingle
    * operators. `keep` gates on the ROUNDED cross-entropy so cross-engine
    * low bits can never flip the policy bit.
    *
    * Numeric parity: each bigram's ln is correctly rounded on both engines
    * (the [[tfidfTopTerms]]/[[bm25TopDocs]] contract) and everything
    * feeding it is exact integer-valued doubles, so the per-term value is
    * bit-identical — but a per-doc SUM of doubles is addition-order
    * dependent and Spark partial aggregation orders nondeterministically.
    * Same fix as the k-means dimension sums ([[Similarity.KmeansScale]]):
    * sum floor(ln·10^7) as LONGS — order-free, exact, and the 1e-7
    * quantization is three decades below the 4-dp output rounding. The
    * scale is part of the oracle contract.
    *
    * Scale shape: the model tables are token-vocabulary-bounded (Heaps'
    * law), NOT corpus-bounded — `cb` aggregates the train slice's bigrams
    * once, `cu` and `v` derive from frames already vocabulary-sized. The
    * scoring stream is O(corpus tokens) rows of four short columns through
    * two equi shuffle joins (bigram counts may outgrow a broadcast at real
    * vocabulary sizes; the per-lang V frame does broadcast) and one final
    * doc-keyed aggregate. No quadratic step, no driver collect.
    */
  def perplexityScores(docs: DataFrame, trainMod: Int = 10, trainLt: Int = 3,
                       threshold: Double = 3.5): DataFrame = {
    val (cb, vocab) = perplexityModel(docs, trainMod, trainLt)
    perplexityScoresWith(docs,
      // persisted: cb feeds both the score join and the cu derivation, and
      // Catalyst duplicates unpersisted common subtrees — without this the
      // train slice is exploded and aggregated twice (same caller-clearCache
      // lifecycle contract as the Dedup signature persists)
      cb.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
      vocab, threshold)
  }

  /** The LM half of [[perplexityScores]]: (lang, w1, w2, cb) bigram counts
    * and (lang, v) vocabulary sizes off the deterministic reference slice.
    * Split out so a versioned store ([[CorpusStore]]'s model sidecars) can
    * materialize the trained model once per corpus snapshot and feed
    * [[perplexityScoresWith]] on later refreshes.
    */
  def perplexityModel(docs: DataFrame, trainMod: Int = 10,
                      trainLt: Int = 3): (DataFrame, DataFrame) = {
    val isTrain = col("doc_id") % trainMod < trainLt
    val cb = bigrams(docs.filter(isTrain))
      .groupBy(col("lang"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("cb"))
    // vocabulary derives from the train slice only — never the full corpus
    val vocab = docs.filter(isTrain)
      .select(col("lang"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("lang")).agg(count_distinct(col("tok")).as("v"))
    (cb, vocab)
  }

  /** The scoring half of [[perplexityScores]] under a supplied model —
    * byte-identical to the self-training form when the model frames equal
    * the internally-trained ones (spec-asserted). Continuation totals
    * derive from the (vocabulary-bounded) bigram counts, so the model side
    * never re-scans any corpus.
    */
  def perplexityScoresWith(docs: DataFrame, cbModel: DataFrame,
                           vocab: DataFrame,
                           threshold: Double = 3.5): DataFrame = {
    val bg = bigrams(docs)
    val cu = cbModel.groupBy(col("lang"), col("w1")).agg(sum(col("cb")).as("cu"))
    bg.join(cbModel, Seq("lang", "w1", "w2"), "left")
      .join(cu, Seq("lang", "w1"), "left")
      .join(broadcast(vocab), Seq("lang"))
      .withColumn("__q", floor(log(
        (coalesce(col("cb"), lit(0L)).cast("double") + lit(1.0))
          / (coalesce(col("cu"), lit(0L)).cast("double") + col("v").cast("double")))
        * lit(1.0e7)).cast("long"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__q")).as("__sq"))
      .withColumn("cross_entropy",
        bround(-(col("__sq").cast("double") / lit(1.0e7)) / col("n_bigrams"), 4))
      .withColumn("keep", col("cross_entropy") <= threshold)
      .select(col("doc_id"), col("lang"), col("n_bigrams"),
        col("cross_entropy"), col("keep"))
  }

  /** (doc_id, lang, w1, w2) exploded bigrams. Token array staged BEFORE
    * the bigram lambda (the tokens() evaluation contract): element_at(w, i)
    * with the split captured in the lambda re-tokenizes per bigram —
    * quadratic per document.
    */
  private def bigrams(docs: DataFrame): DataFrame = {
    val t = col("__toks")
    docs
      .select(col("doc_id"), col("lang"), tokens(col("text")).as("__toks"))
      .select(col("doc_id"), col("lang"),
      explode(when(size(t) >= 2,
        transform(sequence(lit(1), size(t) - 1),
          i => struct(element_at(t, i).as("w1"), element_at(t, i + 1).as("w2"))))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("b"))
      .select(col("doc_id"), col("lang"), col("b.w1").as("w1"), col("b.w2").as("w2"))
  }

  /** C4-style boilerplate REMOVAL (the transform [[chunkDedup]] is the
    * stats for): drop every k-token chunk whose corpus-wide occurrence
    * exceeds `maxOcc` (shared headers/footers/navigation), reassemble the
    * survivors in document order. Zero-token docs are absent (no chunks),
    * fully-boilerplate docs come back with empty `clean_text` — the
    * downstream quality gate drops those.
    *
    * Shape at scale: one chunk-hash-keyed window counts occurrences (the
    * same single shuffle as [[chunkDedup]]); reassembly is a per-doc
    * aggregate — `collect_list` is bounded by the document's own chunk
    * count, never corpus-sized state.
    */
  def scrubBoilerplate(docs: DataFrame, k: Int = 8, maxOcc: Int = 1,
                       passthrough: Seq[String] = Nil): DataFrame = {
    val chunks = chunkExplode(docs, k, passthrough)
    val occ = chunks.withColumn("__n",
      count(lit(1)).over(Window.partitionBy(md5(col("chunk")))))
    occ.groupBy(col("doc_id") +: passthrough.map(col): _*)
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("__n") > maxOcc, 1L).otherwise(0L)).as("n_removed_chunks"),
        // when(...) with no otherwise -> null; collect_list skips nulls, so
        // only surviving chunks are gathered, re-ordered by their index
        array_join(transform(
          array_sort(collect_list(
            when(col("__n") <= maxOcc, struct(col("idx"), col("chunk"))))),
          x => x.getField("chunk")), " ").as("clean_text"))
  }

  /** THE k-token chunk contract, in one place: one row per (doc, 1-based
    * chunk index) with any `passthrough` columns carried along — the shared
    * explode [[chunkDedup]], [[scrubBoilerplate]], and the pipeline's scrub
    * stage all build on (so chunk boundaries can never drift between the
    * stats and the transform). Zero-token docs emit no rows.
    */
  private def chunkExplode(docs: DataFrame, k: Int,
                           passthrough: Seq[String]): DataFrame = {
    // token array staged BEFORE the chunk lambda (the tokens() evaluation
    // contract): slice(w, …) with the split captured re-tokenizes per chunk
    val w = col("__toks")
    val nChunks = floor((size(w) + (k - 1)) / lit(k)).cast("int")
    val keys = col("doc_id") +: passthrough.map(col)
    docs.select(keys :+ tokens(col("text")).as("__toks"): _*)
      .select(keys :+
      explode(when(size(w) >= 1,
        transform(sequence(lit(1), nChunks),
          i => struct(i.as("idx"),
            concat_ws(" ", slice(w, (i - 1) * k + 1, lit(k))).as("chunk"))))
        .otherwise(array().cast("array<struct<idx:int,chunk:string>>"))).as("c"): _*)
      .select(keys ++ Seq(col("c.idx").as("idx"), col("c.chunk").as("chunk")): _*)
  }

  /** PII patterns — deliberately Java-regex ∩ RE2 (no lookarounds, no
    * backrefs) so the Spark scrub and the DuckDB oracle run the IDENTICAL
    * pattern text.
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val phonePattern = "\\+\\d{9,15}"

  /** Deterministic PII-bearing raw docs synthesized from the corpus (the
    * test tables are PII-free word salad): doc_id-derived emails / IPv4s /
    * phone numbers appended on residue classes, so counts vary per doc and
    * the whole synthesis is a pure column expression mirrored in the
    * oracle — the same seam pattern as
    * [[graft.sources.PayloadDecode.syntheticKlinePayloads]].
    */
  def syntheticPiiDocs(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    docs.select(id, concat(
      col("text"),
      when(id % 3 === 0,
        concat(lit(" contact user"), id, lit("@example.com"))).otherwise(lit("")),
      when(id % 4 === 0,
        concat(lit(" from 10."), id % 256, lit("."),
          floor(id / 7).cast("long") % 256, lit(".1"))).otherwise(lit("")),
      when(id % 5 === 0,
        concat(lit(" call +1555"),
          lpad((id % 10000).cast("string"), 7, "0"))).otherwise(lit("")))
      .as("raw"))
  }

  /** The sequential email → IPv4 → phone redaction chain of [[piiScrub]] as
    * a pure column (the replacement tokens cannot re-match a later pattern),
    * reusable inline by the composed pipeline.
    */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(text,
      emailPattern, "[EMAIL]"), ipv4Pattern, "[IP]"), phonePattern, "[PHONE]")

  /** PII detection + redaction over a (doc_id, raw) frame: per-pattern match
    * counts on the ORIGINAL text, then sequential redaction (email → IPv4 →
    * phone; the replacement tokens cannot re-match a later pattern). The
    * redacted text is emitted as md5 + length so the oracle hash-compares
    * the full scrub without shipping document bodies through the gate.
    * Map-side only — scales linearly with input splits, like the other
    * per-row text metrics.
    */
  def piiScrub(raw: DataFrame): DataFrame = {
    val r3 = redactPii(col("raw"))
    def n(p: String) =
      size(regexp_extract_all(col("raw"), lit(p), lit(0))).cast("long")
    // two-step select: `__red` feeds both md5 and length, and CollapseProject
    // declines to merge projects that reference a non-cheap expression twice
    // — so the 3-regex redaction chain runs once per row, not twice (the
    // q_doc_fingerprint lesson)
    raw.select(col("doc_id"),
      n(emailPattern).as("n_emails"),
      n(ipv4Pattern).as("n_ipv4"),
      n(phonePattern).as("n_phones"),
      r3.as("__red"))
    .select(col("doc_id"), col("n_emails"), col("n_ipv4"), col("n_phones"),
      md5(col("__red")).as("redacted_hash"),
      length(col("__red")).cast("long").as("n_chars_redacted"))
  }

  /** Per-language top-k vocabulary by occurrence count — the corpus-level
    * token frequency table BPE-style tokenizer training starts from. Ties
    * break on the token string so the LIMIT is deterministic.
    *
    * Scale shape: one shuffle keyed on (lang, token) with map-side partial
    * aggregation — the combiner collapses each split to its local
    * vocabulary, which is bounded (Heaps' law), so shuffle volume grows
    * with vocabulary, not corpus; the rank window then runs over per-lang
    * counts, already tiny.
    */
  def vocabularyTopK(docs: DataFrame, k: Int = 10): DataFrame = {
    val counts = docs
      .select(col("lang"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("lang"), col("token"))
      .agg(count(lit(1)).as("n_occurrences"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n_occurrences").desc, col("token"))
    counts
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}

/** Shared shingle machinery (used by TextOps + Dedup). */
object Shingles {
  /** Overlapping k-word shingles of a token array (1-based slice, matches the
    * DuckDB list-comprehension form in the oracles).
    */
  def shingles(words: Column, k: Int): Column =
    // guard: sequence(1, 0) in Spark is DESCENDING [1, 0], not empty
    when(size(words) >= k,
      transform(sequence(lit(1), size(words) - (k - 1)),
        i => concat_ws(" ", slice(words, i, lit(k)))))
      .otherwise(array().cast("array<string>"))
}
