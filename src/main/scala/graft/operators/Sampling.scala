package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation. `sample()`'s RNG is
  * seed- and partitioning-dependent; these are pure functions of the row key
  * — stable across reruns, engines, and cluster layouts, so a sample drawn
  * at 100 TB is reproducible row-for-row.
  *
  * Trick: a row's md5 hex string compared lexicographically against a hex
  * prefix selects an exact fraction of the hash space (`md5(k) < '4'` ⇔
  * first nibble ∈ 0-3 ⇔ 25%), with no integer-hash parity issues.
  */
object Sampling {

  /** Keep the fraction of rows whose key-hash falls below `hexThreshold`
    * (e.g. "4" → 25%, "1" → 6.25%, "8" → 50%).
    */
  def deterministicSample(df: DataFrame, key: Column, hexThreshold: String): DataFrame = {
    // md5 is lowercase hex; an uppercase threshold would silently compare
    // wrong ('a' > 'F' lexicographically)
    require(hexThreshold.nonEmpty && hexThreshold.forall(c =>
      c.isDigit || ('a' to 'f').contains(c)),
      s"hexThreshold must be lowercase hex, got '$hexThreshold'")
    df.filter(md5(key.cast("string")) < hexThreshold)
  }

  /** Exactly `n` rows per stratum, chosen by key-hash order (a deterministic
    * per-group reservoir): shuffle keyed on the stratum, window top-n.
    */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column, n: Int): DataFrame = {
    val w = Window.partitionBy(stratum).orderBy(md5(key.cast("string")), key)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Token-budget-capped deterministic sampling per source — the data-mixing
    * primitive: each source contributes documents in key-hash order (an
    * unbiased deterministic shuffle, same trick as [[deterministicSample]])
    * until its token budget fills; a doc is kept when its START offset falls
    * inside the budget (`cum − own < budget`, the [[Corpus.packBins]] fill
    * rule), so each source overshoots by at most one document and the kept
    * set is a stable prefix: growing the corpus only APPENDS candidates to
    * the hash order's tail, it never evicts an already-kept early-hash doc
    * unless new docs hash ahead of it — and re-runs are row-identical.
    * Output per source: docs kept and tokens kept (the mixing report).
    *
    * Scale shape: one window cumsum keyed on source (single shuffle), then
    * the per-source agg reuses that partitioning — same plan family as
    * [[Corpus.packBins]]. Tokens are the regex tokenizer's count, so mixing
    * and packing account in the same unit.
    */
  def budgetSample(docs: DataFrame, budget: Long = 800): DataFrame = {
    val toks = size(regexp_extract_all(col("text"),
      lit(TextOps.tokenPattern), lit(0))).cast("long")
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    docs.select(col("source"), col("doc_id"), toks.as("n_tokens"))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .filter(col("__cum") - col("n_tokens") < budget)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs_kept"),
        sum(col("n_tokens")).as("tokens_kept"))
  }

  /** Deterministic train/val/test assignment by hash-space thresholds: the
    * same hex-prefix trick as [[deterministicSample]], with two cut points
    * (defaults 'cc' = 204/256 ≈ 79.7% train, 'e6' = 230/256 → ≈10.2% val,
    * rest test). Pure function of the key: a document keeps its split
    * across reruns, engines, and corpus growth — the property that stops
    * val/test contamination when the corpus is rebuilt. Map-side only.
    */
  def trainValTestSplit(df: DataFrame, key: Column,
                        trainHex: String = "cc", valHex: String = "e6"): DataFrame = {
    require(trainHex < valHex, "train threshold must precede val threshold")
    val h = md5(key.cast("string"))
    df.withColumn("split",
      when(h < trainHex, "train").when(h < valHex, "val").otherwise("test"))
  }

  /** Deterministic GLOBAL training order: every document gets a dense rank
    * 0..n−1 in seeded-hash order — the corpus-wide shuffle a training run
    * fixes before sharding into data-loader files, reproducible
    * row-for-row across reruns and cluster layouts.
    *
    * Scale shape: a naive `row_number() OVER (ORDER BY hash)` collapses
    * the corpus into ONE window partition — dead at any scale. Here the
    * frame is range-repartitioned and sorted on (hash, doc_id), partition
    * ROW COUNTS (one long per partition — metadata, like the watermark
    * collects) become rank offsets, and each partition stamps its rows
    * with offset+index. Range boundaries come from sampling and may move
    * between runs, but the stamped order is a pure function of the total
    * (hash, doc_id) order — boundary placement only changes which executor
    * stamps a row, never its rank.
    */
  /** Data-loader shard assignment: round-robin over the [[trainingOrder]]
    * rank (`shard = rank % nShards`), so shards are balanced to ±1 doc
    * WITHOUT knowing the corpus size (contiguous blocks would need a
    * count first) and each shard sees documents in a hash-shuffled order —
    * exactly what per-worker loader files want.
    */
  def shardAssignments(docs: DataFrame, nShards: Int = 8,
                       seed: String = "graft"): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    trainingOrder(docs, seed)
      .withColumn("shard", col("train_rank") % nShards)
  }

  /** Per-shard doc/char totals — the loader-manifest summary a sharded
    * export records next to the files.
    */
  def shardStats(docs: DataFrame, nShards: Int = 8,
                 seed: String = "graft"): DataFrame =
    shardAssignments(docs, nShards, seed)
      .join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("sum_chars"))

  /** Temperature-based domain mixture weights (the UnifiedQA/PaLM
    * `p_i^α / Σ p_j^α` rule at α = 0.5): per source, the token share and
    * the re-balanced sampling weight that upweights small domains without
    * letting any single giant source dominate an epoch.
    *
    * α is FIXED at 0.5 so the power is `sqrt` — correctly rounded in
    * IEEE-754 on both engines, unlike libm `pow`, which carries no
    * cross-engine bit guarantee. The normalizing denominator sums
    * floor(sqrt(share)·10^9) as LONGS (the [[Similarity.KmeansScale]]
    * fixed-point contract) so the Σ is addition-order-free; every output
    * double is then a deterministic function of exact integers.
    *
    * Scale shape: one groupBy(source) aggregate (partial map-side, output
    * rows = number of sources), a broadcast scalar for corpus totals, and
    * a whole-frame window over the source-count-sized frame — nothing
    * downstream of the scan is corpus-sized.
    */
  def mixtureWeights(docs: DataFrame): DataFrame = {
    val perSource = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextOps.tokens(col("text"))).cast("long")).as("n_tokens"))
    val total = perSource.agg(sum(col("n_tokens")).as("__t"))
    val q = floor(sqrt(col("n_tokens").cast("double") / col("__t"))
      * lit(1.0e9)).cast("long")
    perSource.crossJoin(broadcast(total))
      .withColumn("__q", q)
      .withColumn("__denom", sum(col("__q")).over(Window.partitionBy()))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        bround(col("n_tokens").cast("double") / col("__t"), 4).as("token_share"),
        bround(col("__q").cast("double") / col("__denom"), 4).as("mix_weight"))
  }

  def trainingOrder(docs: DataFrame, seed: String = "graft"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val parts = spark.sparkContext.defaultParallelism
    val sorted = docs
      .select(col("doc_id"),
        md5(concat_ws(":", lit(seed), col("doc_id").cast("string"))).as("__h"))
      .repartitionByRange(parts, col("__h"), col("doc_id"))
      .sortWithinPartitions(col("__h"), col("doc_id"))
      .as[(Long, String)]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = sorted.rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
      .collect().sortBy(_._1).map(_._2)
    val offsets = spark.sparkContext.broadcast(counts.scanLeft(0L)(_ + _))
    sorted.rdd
      .mapPartitionsWithIndex { (i, it) =>
        var next = offsets.value(i)
        it.map { case (id, _) => val r = (id, next); next += 1L; r }
      }
      .toDF("doc_id", "train_rank")
  }
}
