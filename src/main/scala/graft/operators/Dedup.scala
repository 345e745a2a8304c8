package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Deduplication operators for a training-data pipeline over `documents`:
  * exact (hash groupBy), MinHash+LSH banding, n-gram Jaccard on blocked
  * candidate pairs, and SimHash signatures.
  *
  * Cross-engine hash convention: md5 hex strings. Both Spark and DuckDB ship
  * md5; the hex string is fixed-width, so LEXICOGRAPHIC min == numeric min of
  * the 128-bit value — which makes MinHash signatures oracle-checkable
  * without a shared integer-hash function. Seeded hash j of shingle s is
  * `md5(j || ':' || s)`.
  *
  * Scale design: signatures are map-side per-document expressions; the only
  * shuffles are the LSH bucket self-join (keyed by (band_id, band_hash), so
  * co-bucketed docs land in one partition — the classic band-join) and the
  * pair verification join. Brute-force all-pairs never happens: candidates
  * come from band buckets or cheap blocking keys.
  */
object Dedup {

  val ShingleK = 3
  val NumHashes = 16
  val NumBands = 4 // 4 rows/band → LSH threshold ≈ (1/4)^(1/4) ≈ 0.71

  /** Skew guard for every LSH band join: a band bucket larger than this is
    * dropped before pair generation. A degenerate band (e.g. a constant
    * signature over millions of boilerplate docs) would otherwise emit
    * O(bucket²) pairs into a single task; with the cap, per-bucket work is
    * ≤ cap² and a 100 TB job's worst task stays bounded. Dropped buckets are
    * a deliberate recall trade — a bucket this size is not discriminating
    * anyway (its docs pair with everything). Oracles mirror the cap via
    * QUALIFY, so the semantics are part of the contract, not a fudge.
    */
  val MaxBucketSize = 1000

  /** Exact dedup: group identical texts by md5, keep the lowest doc_id
    * (deterministic survivor), report group size.
    */
  def exactDedup(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Keep ONE full row per key — the row minimizing `ord` — as a groupBy +
    * `min_by` over the row struct instead of a row_number window. Same
    * output (`ord` must be unique per key for determinism), radically
    * different skew profile: partial aggregation collapses each map
    * partition to one candidate row per key BEFORE the shuffle, so a
    * degenerate key (a boilerplate text with millions of exact copies)
    * shuffles O(map partitions) rows instead of concentrating the whole
    * group — full text payload included — in one window task. The exact-
    * dedup stages of every corpus build go through this kernel.
    */
  private[graft] def keepMinBy(df: DataFrame, key: Column, ord: Column): DataFrame = {
    val cols = df.columns
    df.groupBy(key.as("__k"))
      .agg(min_by(struct(cols.map(col): _*), ord).as("__r"))
      .select(cols.map(c => col(s"__r.$c").as(c)): _*)
  }

  private def docShingles(docs: DataFrame): DataFrame =
    // token array staged BEFORE the shingle lambda (the TextOps.tokens()
    // evaluation contract): with the split captured in the lambda, slice
    // re-tokenized per shingle — quadratic per document on THE most
    // expensive corpus-wide pass (measured 40.8 s → ~1 s for 500 docs ×
    // 2000 tokens)
    docs.select(col("doc_id"), TextOps.tokens(col("text")).as("__toks"))
      .select(col("doc_id"),
        array_distinct(Shingles.shingles(col("__toks"), ShingleK))
          .as("shingles"))

  /** doc_id + shingles + sig_0..sig_{NumHashes-1} from a (doc_id, shingles)
    * frame. Shingles ride along: every consumer that bands the signatures
    * also verifies candidates against the exact shingle sets, so the
    * combined frame is the natural unit to persist or stage.
    *
    * Signatures come from the codegen'd `graft_minhash` kernel — ONE array
    * traversal computing all [[NumHashes]] seeded minima (semantically
    * identical to NumHashes `array_min(transform(md5(j:s)))` chains, which
    * it replaced after they measured 109 s cold / 16 redundant traversals
    * at sf0.1 — see [[graft.functions.MinHashSignatures]]). Two-step
    * select: the kernel alias is referenced NumHashes times below and
    * CollapseProject keeps non-cheap multiply-referenced aliases staged,
    * so the kernel runs once per row.
    */
  private[operators] def rawSignatures(shingleSets: DataFrame): DataFrame = {
    graft.functions.TextExpressions.register(shingleSets.sparkSession)
    val sigs = (0 until NumHashes).map(j =>
      element_at(col("__sigs"), j + 1).as(s"sig_$j"))
    shingleSets
      .withColumn("__sigs",
        call_function("graft_minhash", col("shingles"), lit(NumHashes)))
      .select(col("doc_id") +: col("shingles") +: sigs: _*)
  }

  /** The full per-document dedup state — (doc_id, shingles, sig_0..15) — as
    * one map-side frame: what [[SignatureStore.build]] materializes once per
    * corpus snapshot so every dedup consumer skips the
    * tokenize→shingle→16-seeded-md5 recompute.
    */
  def shingleSignatures(docs: DataFrame): DataFrame =
    rawSignatures(docShingles(docs))

  /** Banded-LSH pairs + exact-Jaccard verification over a prebuilt
    * [[shingleSignatures]] frame (in-memory or read back from a
    * [[SignatureStore]] stage).
    */
  private[operators] def pairsFromShingleSigs(ss: DataFrame, rowsPerBand: Int,
                                              threshold: Double, cap: Int): DataFrame =
    pairsFromShingleSigsWithHandle(ss, rowsPerBand, threshold, cap)._1

  /** [[pairsFromShingleSigs]] plus the band-cache handle (see
    * [[bandPairsWithHandle]]) — the tick loop's form.
    */
  private def pairsFromShingleSigsWithHandle(ss: DataFrame, rowsPerBand: Int,
                                             threshold: Double, cap: Int)
      : (DataFrame, DataFrame) = {
    val (cand, bands) = bandPairsWithHandle(
      explodedBands(ss, rowsPerBand), cap, "doc_a", "doc_b")
    (verifyJaccard(cand, ss.select(col("doc_id"), col("shingles")), threshold),
      bands)
  }

  /** Band hash over `rowsPerBand` consecutive signatures.
    * concat (NOT concat_ws): null sigs — a doc with < ShingleK tokens — must
    * propagate to a null band like the oracle's `||`, so shingle-less docs
    * never co-bucket (concat_ws would give them all md5("")).
    */
  private def bandHash(b: Int, rowsPerBand: Int): Column = {
    val parts = (b * rowsPerBand until (b + 1) * rowsPerBand).map(j => col(s"sig_$j"))
    md5(concat(parts.flatMap(c => Seq(c, lit("|"))).dropRight(1): _*))
  }

  /** MinHash signatures: NumHashes seeded-md5 minima per document, plus the
    * NumBands banded bucket hashes for LSH. Entirely map-side.
    */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    val withSigs = rawSignatures(docShingles(docs))
    val bands = (0 until NumBands).map(b => bandHash(b, NumHashes / NumBands).as(s"band_$b"))
    withSigs.select(col("doc_id") +:
      (0 until NumHashes).map(j => col(s"sig_$j")) ++: bands: _*)
  }

  /** Drop bucket groups larger than `cap` before pair generation — the
    * skew guard shared by every LSH band join (see [[MaxBucketSize]]). One
    * count aggregate keyed like the join itself; the join back reuses the
    * same partitioning, so the guard costs one small extra shuffle of the
    * per-bucket counts, never a re-shuffle of the data.
    */
  private[graft] def capBuckets(buckets: DataFrame, keys: Seq[String], cap: Int): DataFrame = {
    val counts = buckets.groupBy(keys.map(col): _*).agg(count(lit(1)).as("bucket_n"))
    buckets.join(counts.filter(col("bucket_n") <= cap), keys).drop("bucket_n")
  }

  /** THE shared band-join kernel — every LSH family (MinHash bands, n-gram
    * re-bands, sign-LSH buckets, banded embedding LSH) generates candidate
    * pairs through this one path, so the skew cap, the null-bucket drop,
    * and the persist policy live in exactly one place.
    *
    * `buckets` must be (id, band_id, band_val) in that column order. Null
    * band values (signature-less rows) never co-bucket. The frame is
    * PERSISTED because it is read three times (the count aggregate in
    * [[capBuckets]], then both sides of the self-join) and the bucket
    * expressions feeding it — seeded-md5 signatures, 48-plane sign dots —
    * are the most expensive map-side work in their modules; without the
    * persist each reference recomputes them from the scan up. Cache
    * lifecycle: the caller's session owns the entries (Bench/Verify
    * clearCache between queries; [[SignatureStore]]/staged forms are the
    * cross-query alternative). Output: distinct (aName < bName) id pairs —
    * ids only, so band explosion never multiplies payload columns.
    */
  private[graft] def bandPairs(buckets: DataFrame, cap: Int,
                               aName: String, bName: String): DataFrame =
    bandPairsWithHandle(buckets, cap, aName, bName)._1

  /** [[bandPairs]] plus the persisted band frame itself, for callers that
    * outlive a per-query cache lifecycle (the store tick loop): once the
    * pairs are fully consumed, the caller unpersists the handle so a
    * stream of ticks holds no accumulating band caches.
    */
  private def bandPairsWithHandle(buckets: DataFrame, cap: Int,
                                  aName: String, bName: String)
      : (DataFrame, DataFrame) = {
    val b = buckets.toDF("id", "band_id", "band_val")
      .filter(col("band_val").isNotNull)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val capped = capBuckets(b, Seq("band_id", "band_val"), cap)
    val pairs = capped.as("a")
      .join(capped.as("b"),
        col("a.band_id") === col("b.band_id")
          && col("a.band_val") === col("b.band_val")
          && col("a.id") < col("b.id"))
      .select(col("a.id").as(aName), col("b.id").as(bName))
      .distinct()
    (pairs, b)
  }

  /** (doc_id, band_id, band_val) exploded band buckets of a
    * [[shingleSignatures]] frame — the input shape of [[bandPairs]], of
    * the asymmetric batch-vs-corpus join in [[incrementalNearDups]], and
    * of the band rows [[CorpusStore]] materializes per tick (partitioned
    * by band bucket, so later ticks file-prune their band scans). Null
    * band values (signature-less docs) are dropped here so no consumer
    * co-buckets them.
    */
  private[graft] def explodedBands(sigs: DataFrame, rowsPerBand: Int): DataFrame = {
    val numBands = NumHashes / rowsPerBand
    val bandCols = (0 until numBands).map(b =>
      struct(lit(b).as("band_id"), bandHash(b, rowsPerBand).as("band_hash")))
    sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("band"))
      .select(col("doc_id"), col("band.band_id").as("band_id"),
        col("band.band_hash").as("band_val"))
      .filter(col("band_val").isNotNull)
  }

  /** Candidate pairs from banded signature equality: docs sharing any of the
    * NumHashes/rowsPerBand band buckets pair up (Σ bucket², never n²), via
    * the shared [[bandPairs]] kernel.
    */
  private def bandedCandidates(sigs: DataFrame, rowsPerBand: Int, cap: Int): DataFrame =
    bandPairs(explodedBands(sigs, rowsPerBand), cap, "doc_a", "doc_b")

  /** Shared banded-LSH + exact-Jaccard pipeline, self-contained form. The
    * [[shingleSignatures]] frame is PERSISTED: it is referenced three times
    * in one plan (banding, then both sides of the verification join), and
    * without the persist each reference re-scans `documents` and re-runs
    * tokenize → shingle → seeded-md5. With it (plus the bucket persist in
    * [[bandedCandidates]]) the whole query performs exactly one scan of the
    * input. Cache lifecycle: the caller's session owns the entries —
    * `Bench`/`Verify` clearCache between queries. The cross-QUERY form of
    * the same amortization is [[SignatureStore]]: materialize this frame
    * once per corpus snapshot and feed [[pairsFromShingleSigs]] directly.
    */
  private def lshVerifiedPairs(docs: DataFrame, rowsPerBand: Int,
                               threshold: Double, cap: Int): DataFrame = {
    val ss = shingleSignatures(docs).persist(StorageLevel.MEMORY_AND_DISK)
    pairsFromShingleSigs(ss, rowsPerBand, threshold, cap)
  }

  /** MinHash LSH candidate pairs + exact-Jaccard verification: docs sharing
    * any band bucket are candidates; candidates are verified against the true
    * shingle-set Jaccard and kept when ≥ `threshold`.
    */
  def minhashLshPairs(docs: DataFrame, threshold: Double = 0.5,
                      cap: Int = MaxBucketSize): DataFrame =
    lshVerifiedPairs(docs, NumHashes / NumBands, threshold, cap)

  /** n-gram Jaccard near-dup pairs at a lower threshold (0.3) than the LSH
    * dedup path. Candidates re-band the SAME 16 MinHash signatures as
    * 8 bands × 2 rows — s-curve midpoint (1/8)^(1/2) ≈ 0.35, sitting at this
    * verification threshold. (The previous generator blocked on
    * (lang, length-bucket): block membership is a constant fraction of the
    * corpus, so per-block pair count grew quadratically with corpus size —
    * dead at 100 TB. Band buckets shrink as signatures spread; the cap
    * bounds whatever skew remains.)
    */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double = 0.3,
                        cap: Int = MaxBucketSize): DataFrame =
    lshVerifiedPairs(docs, 2, threshold, cap)

  /** Exact shingle-set Jaccard for candidate pairs: two joins against the
    * per-doc shingle arrays, then set arithmetic — integer counts, one double
    * division at the end (bit-stable cross-engine).
    */
  private def verifyJaccard(pairs: DataFrame, shingleSets: DataFrame,
                            threshold: Double): DataFrame = {
    val sa = shingleSets.select(col("doc_id").as("doc_a"), col("shingles").as("sa"))
    val sb = shingleSets.select(col("doc_id").as("doc_b"), col("shingles").as("sb"))
    // explicit spread: the pair set is tiny in BYTES but heavy in CPU
    // (array_intersect over ~300-string arrays per pair) — AQE would
    // coalesce it to 1-2 partitions on size alone and serialize the work
    val spread = pairs.repartition(
      pairs.sparkSession.sparkContext.defaultParallelism,
      col("doc_a"), col("doc_b"))
    // the set counts are staged through [[Staged.once]]: with plain
    // withColumns, the threshold filter folded into the JOIN CONDITION and
    // re-evaluated array_union 3× / array_intersect 2× per candidate pair
    // (measured in the formatted plan) — the heaviest per-pair work here
    Staged.once(spread.join(sa, "doc_a").join(sb, "doc_b"),
        Seq("doc_a", "doc_b"),
        Seq("n_common" -> size(array_intersect(col("sa"), col("sb"))).cast("long"),
          "n_union" -> size(array_union(col("sa"), col("sb"))).cast("long")))
      // n_union=0 (two shingle-less docs): guard the division (ANSI would
      // throw) and drop the pair on both engines (oracle has the same
      // n_union > 0 condition — DuckDB's 0.0/0 is NaN, which its >= keeps!)
      .withColumn("jaccard",
        when(col("n_union") > 0, col("n_common").cast("double") / col("n_union")))
      .filter(col("n_union") > 0 && col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("n_union"), col("jaccard"))
  }

  /** SimHash block layout for pigeonhole banding: 9 blocks covering all 64
    * bits (8×7 + 1×8). Any two signatures at Hamming distance ≤ 8 have ≤ 8
    * differing bits spread over 9 blocks, so at least one block is identical
    * — candidate generation through per-block equality joins has GUARANTEED
    * recall at the verification threshold (unlike a single prefix block,
    * which silently misses pairs differing inside the prefix).
    * (start, length), 1-based for substring on both engines.
    */
  val SimhashBlocks: Seq[(Int, Int)] =
    (0 until 8).map(k => (1 + 7 * k, 7)) :+ (57, 8)

  /** SimHash near-dup pairs: pigeonhole-banded candidates (see
    * [[SimhashBlocks]]) verified by exact 64-bit Hamming distance ≤
    * `maxDist`. The signature is packed once per document into two BIGINT
    * halves so the per-pair Hamming kernel is
    * `bit_count(hi_a^hi_b) + bit_count(lo_a^lo_b)` — four integer ops,
    * inside whole-stage codegen, instead of 128 substring compares.
    * At scale the shuffle key is (block_id, block_val): Σ bucket², never an
    * all-pairs join; duplicates from multi-block agreement are filtered
    * cheaply (Hamming first) then de-duplicated.
    */
  def simhashPairs(docs: DataFrame, maxDist: Int = 8): DataFrame =
    simhashPairsFromSigs(simhash(docs), maxDist)

  /** Pair kernel over a precomputed (doc_id, simhash_bits) frame — split out
    * so specs can drive it with handcrafted signatures (e.g. a pair
    * differing only inside the first 16 bits, which single-prefix blocking
    * misses).
    */
  def simhashPairsFromSigs(sigs: DataFrame, maxDist: Int = 8): DataFrame = {
    // Join key: (block_id, block value) packed into ONE int — block values
    // are ≤ 8 bits, so key = block_id*256 + value. Integer key hashing and
    // equality beat a string key on the multi-million-candidate probe loop.
    val packed = sigs.select(
      col("doc_id"),
      conv(substring(col("simhash_bits"), 1, 32), 2, 10).cast("long").as("hi"),
      conv(substring(col("simhash_bits"), 33, 32), 2, 10).cast("long").as("lo"),
      explode(array(SimhashBlocks.zipWithIndex.map { case ((start, len), k) =>
        (lit(k * 256) + conv(substring(col("simhash_bits"), start, len), 2, 10)
          .cast("int")).as(s"b_$k")
      }: _*)).as("block_key"))
    val a = packed.select(col("block_key"),
      col("doc_id").as("doc_a"), col("hi").as("hi_a"), col("lo").as("lo_a"))
    val b = packed.select(col("block_key"),
      col("doc_id").as("doc_b"), col("hi").as("hi_b"), col("lo").as("lo_b"))
    // A near-dup pair agrees on MOST blocks (dist ≤ 8 → ≥ 1 by pigeonhole,
    // typically ~7 of 9), so the band join emits each result pair once per
    // agreeing block. Instead of a distinct() — which would shuffle the
    // multiplied pair stream — keep a pair only at its FIRST agreeing block,
    // decided locally from the xor of the packed halves: each pair then
    // survives in exactly one task, and the query has no post-join shuffle.
    val xh = col("hi_a").bitwiseXOR(col("hi_b"))
    val xl = col("lo_a").bitwiseXOR(col("lo_b"))
    def agrees(block: (Int, Int)): Column = {
      val (start, len) = block
      var maskHi = 0L; var maskLo = 0L
      (start until start + len).foreach { p =>
        if (p <= 32) maskHi |= 1L << (32 - p) else maskLo |= 1L << (64 - p)
      }
      (xh.bitwiseAND(lit(maskHi)) === 0) && (xl.bitwiseAND(lit(maskLo)) === 0)
    }
    val firstAgree = SimhashBlocks.zipWithIndex.reverse
      .foldLeft(lit(-1)) { case (acc, (blk, k)) => when(agrees(blk), k).otherwise(acc) }
    a.join(b, Seq("block_key"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming",
        (bit_count(xh) + bit_count(xl)).cast("long"))
      .filter(col("hamming") <= maxDist
        && shiftright(col("block_key"), 8) === firstAgree)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Default a RELIABLE checkpoint location when the session has none.
    * `localCheckpoint` stores blocks executor-local — on a 1000-executor job
    * one lost executor kills the iteration mid-flight; `checkpoint()` writes
    * to this (HDFS-compatible on a cluster — set it to a durable path there;
    * local temp under local[n]) and survives stage retries.
    */
  private def ensureCheckpointDir(df: DataFrame): Unit = {
    val sc = df.sparkSession.sparkContext
    if (sc.getCheckpointDir.isEmpty)
      sc.setCheckpointDir(
        new java.io.File(sys.props.getOrElse("java.io.tmpdir", "/tmp"),
          "graft-checkpoints").getAbsolutePath)
  }

  /** Connected components over a pair graph: min-label propagation with
    * POINTER JUMPING — each round every node takes the smallest label among
    * itself and its neighbors, then shortcuts through that label's own label
    * (label(label(node))). The shortcut doubles the distance covered per
    * round, so rounds ≈ log₂(diameter), not diameter — a 1000-node chain
    * converges in ~10 rounds (see DedupTextSpec), where plain propagation
    * needs 1000. Each round is two shuffle joins + one aggregate, reliably
    * checkpointed (see [[ensureCheckpointDir]]) so plan lineage stays flat
    * and executor loss is recoverable. The distributed union-find for
    * duplicate GROUPS: LSH gives pairs, this gives clusters with the min
    * doc_id as the canonical survivor.
    *
    * SIZE-ADAPTIVE: verified dup pairs are metadata-scale relative to the
    * corpus (banding caps bound them), and when they fit the driver
    * comfortably the loop's fixed per-round costs (two shuffles + a
    * durable checkpoint, × log rounds) dwarf the actual work. At or below
    * `localEdgeLimit` long-typed edges (default 1M ≈ 16 MB collected) the
    * components are computed by an exact driver-side union-find — same
    * min-label semantics, identical output — and only larger graphs pay
    * the iterative plan. The edge frame is persisted either way: the
    * count and the chosen path each consume it once.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 50,
                          localEdgeLimit: Long = 1L << 20): DataFrame = {
    val longTyped = edges.schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.LongType)
    if (longTyped) {
      val persisted = edges.persist(StorageLevel.MEMORY_AND_DISK)
      val result =
        if (persisted.count() <= localEdgeLimit) localComponents(persisted)
        else distributedComponents(persisted, maxIter)
      // released HERE, not left to the caller's session: localComponents
      // returns driver-collected data and distributedComponents eagerly
      // checkpoints the symmetrized edges as its first step, so the
      // persist is fully consumed by the time either returns — and a
      // long-running tick loop (CorpusStore/SignatureStore) must not
      // accumulate one cached edge set per tick
      persisted.unpersist()
      result
    } else distributedComponents(edges, maxIter)
  }

  /** Driver-side exact union-find: path halving + union under the smaller
    * root id, which keeps every set's root equal to its minimum member by
    * induction — so `find` yields exactly the labels the distributed loop
    * converges to.
    */
  private def localComponents(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val es = edges.as[(Long, Long)].collect()
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
      r
    }
    es.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    parent.keys.toSeq.sorted
      .map(n => (n, find(n)))
      .toDF("node", "component")
  }

  private def distributedComponents(edges: DataFrame, maxIter: Int): DataFrame = {
    ensureCheckpointDir(edges)
    val sym = edges.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(edges.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .checkpoint()
    var labels = sym.select(col("src").as("node"), col("src").as("lbl"))
      .distinct().checkpoint()
    var converged = false
    var iter = 0
    while (!converged) {
      iter += 1
      if (iter > maxIter)
        throw new IllegalStateException(
          s"connectedComponents did not converge in $maxIter rounds")
      val viaNeighbor = sym
        .join(labels.withColumnRenamed("node", "dst"), "dst")
        .select(col("src").as("node"), col("lbl"))
      val propagated = labels.union(viaNeighbor)
        .groupBy("node").agg(min(col("lbl")).as("lbl"))
      // pointer jumping: every lbl value is itself a node (labels start as
      // node→node and only ever adopt existing node ids), so the inner
      // self-join below is total and replaces lbl with label(lbl)
      val next = propagated
        .join(propagated.select(col("node").as("lbl"), col("lbl").as("lbl2")), Seq("lbl"))
        .select(col("node"), col("lbl2").as("lbl"))
        .checkpoint()
      converged = next
        .join(labels.withColumnRenamed("lbl", "prev"), "node")
        .filter(col("lbl") =!= col("prev"))
        .isEmpty
      labels = next
    }
    labels.select(col("node"), col("lbl").as("component"))
  }

  /** Near-duplicate GROUPS: LSH candidate pairs → connected components. */
  def dedupGroups(docs: DataFrame, threshold: Double = 0.5): DataFrame =
    connectedComponents(minhashLshPairs(docs, threshold)
      .select(col("doc_a"), col("doc_b")))

  /** INCREMENTAL near-dup detection — the production shape of LSH dedup at
    * 100 TB: an incoming batch of new documents is checked against an
    * EXISTING corpus whose (doc_id, shingles, sig_0..15) state is already
    * staged (a [[SignatureStore]] snapshot, or any [[shingleSignatures]]
    * frame). Output: one row per duplicated new doc — its best corpus match
    * (highest verified Jaccard, ties → lowest corpus doc_id) with the exact
    * overlap counts. New docs with no corpus match ≥ `threshold` are absent
    * (they are the keepers).
    *
    * Scale shape — the corpus is NEVER shuffled:
    *  1. batch bands are small (a batch is ~1e4–1e6 docs against 1e10); the
    *     distinct bucket keys broadcast;
    *  2. corpus band rows are pruned by a broadcast LEFT SEMI join on the
    *     bucket key — evaluated map-side inside the corpus scan stage;
    *  3. the skew cap stays EXACT after pruning: the semi-join keys on the
    *     full bucket key, so it keeps or drops whole buckets — counting the
    *     surviving rows per bucket equals counting the original corpus
    *     bucket ([[capBuckets]] over the pruned frame, a metadata-sized
    *     aggregate, replaces a full-corpus aggregate);
    *  4. candidate (new_id, dup_of) pairs and the verification joins are all
    *     bounded by Σ(batch-touched bucket sizes), capped — broadcast-sized.
    * Semantics match the self-join family: same bands, same cap meaning
    * (corpus bucket size), same exact-Jaccard verification.
    */
  def incrementalNearDups(batchDocs: DataFrame, corpusSigs: DataFrame,
                          threshold: Double = 0.5,
                          cap: Int = MaxBucketSize): DataFrame =
    incrementalNearDupsFromSigs(
      shingleSignatures(batchDocs).persist(StorageLevel.MEMORY_AND_DISK),
      corpusSigs, threshold, cap)

  /** [[incrementalNearDups]] off an already-built (and ideally persisted or
    * staged) batch signature frame — the form [[ingestTick]] and
    * [[SignatureStore.ingestBatch]] call so the batch's
    * tokenize→shingle→md5 pass runs exactly once per tick.
    */
  private[operators] def incrementalNearDupsFromSigs(
      batchSigs: DataFrame, corpusSigs: DataFrame,
      threshold: Double, cap: Int): DataFrame = {
    val verified = incrementalVerified(batchSigs, corpusSigs, threshold, cap)
    val best = org.apache.spark.sql.expressions.Window
      .partitionBy(col("new_id"))
      .orderBy(col("jaccard").desc, col("dup_of"))
    verified
      .withColumn("__rk", row_number().over(best))
      .filter(col("__rk") === 1)
      .select(col("new_id"), col("dup_of"), col("n_common"), col("n_union"),
        col("jaccard"))
  }

  /** Verified batch-vs-corpus near-dup matches (all pairs, unranked) — the
    * shared core of [[incrementalNearDupsFromSigs]] (which ranks to the
    * best match per new doc) and [[ingestTick]] (which only needs the
    * distinct duplicated ids, so the ranking window would be wasted work
    * on every ingest tick).
    */
  private def incrementalVerified(
      batchSigs: DataFrame, corpusSigs: DataFrame,
      threshold: Double, cap: Int): DataFrame = {
    val rowsPerBand = NumHashes / NumBands
    val batchBands = explodedBands(batchSigs, rowsPerBand)
    val corpusBands = explodedBands(corpusSigs, rowsPerBand)
    val touched = corpusBands.join(
      broadcast(batchBands.select(col("band_id"), col("band_val")).distinct()),
      Seq("band_id", "band_val"), "leftsemi")
    val capped = capBuckets(touched, Seq("band_id", "band_val"), cap)
    val candidates = batchBands.as("n")
      .join(capped.as("c"), Seq("band_id", "band_val"))
      .select(col("n.doc_id").as("new_id"), col("c.doc_id").as("dup_of"))
      .distinct()
    verifyCandidates(candidates,
      batchSigs.select(col("doc_id"), col("shingles")),
      corpusSigs.select(col("doc_id"), col("shingles")), threshold)
  }

  /** Exact-Jaccard verification of asymmetric (new_id, dup_of) candidate
    * pairs against two (doc_id, shingles) frames — the shared tail of
    * [[incrementalVerified]] and of [[CorpusStore]]'s pruned tick (which
    * supplies `corpusShingles` from a file-pruned store read instead of a
    * full corpus frame). Same null-union guard and explicit spread as the
    * self-join family.
    */
  private[operators] def verifyCandidates(candidates: DataFrame,
                                          batchShingles: DataFrame,
                                          corpusShingles: DataFrame,
                                          threshold: Double): DataFrame = {
    val sn = batchShingles.select(col("doc_id").as("new_id"), col("shingles").as("sn"))
    val sc = corpusShingles.select(col("doc_id").as("dup_of"), col("shingles").as("sc"))
    val spread = candidates.repartition(
      candidates.sparkSession.sparkContext.defaultParallelism,
      col("new_id"), col("dup_of"))
    // Staged.once barrier — same joined-in filter duplication as
    // [[verifyJaccard]], same fix
    Staged.once(spread.join(sn, "new_id").join(sc, "dup_of"),
        Seq("new_id", "dup_of"),
        Seq("n_common" -> size(array_intersect(col("sn"), col("sc"))).cast("long"),
          "n_union" -> size(array_union(col("sn"), col("sc"))).cast("long")))
      .withColumn("jaccard",
        when(col("n_union") > 0, col("n_common").cast("double") / col("n_union")))
      .filter(col("n_union") > 0 && col("jaccard") >= threshold)
  }

  /** One tick of the dedup-ingest loop: drop batch docs that near-dup the
    * store ([[incrementalNearDupsFromSigs]]), then dedup the survivors
    * AGAINST EACH OTHER (banded pairs + connected components, keep each
    * component's minimum doc_id) — without the within-batch step two copies
    * of a new document would both enter the store. Returns the keepers'
    * full signature rows, ready to append to the store. `storeSigs = None`
    * is the bootstrap tick (empty store → within-batch dedup only).
    *
    * `releaseIntermediate = true` is the LONG-RUNNING caller's form (the
    * disk-backed store ticks): the internal `rem` persist is released
    * before returning, with the keepers persisted + materialized in its
    * place — the caller unpersists the returned frame after its commit,
    * so a stream of ticks holds no accumulating executor storage. One-shot
    * query callers keep the default (their session clears caches per
    * query; the extra materialization pass would be pure cost).
    */
  private[operators] def ingestTick(batchSigs: DataFrame,
                                    storeSigs: Option[DataFrame],
                                    threshold: Double,
                                    cap: Int,
                                    releaseIntermediate: Boolean = false)
      : DataFrame = {
    val rem = storeSigs match {
      case Some(store) =>
        // ids only — the best-match ranking of the public operator is
        // wasted work here, any verified match disqualifies the doc. No
        // distinct(): LEFT ANTI ignores probe-side duplicates, so the
        // dedup exchange+aggregate was a wasted shuffle stage per wave
        val dupIds = incrementalVerified(batchSigs, store, threshold, cap)
          .select(col("new_id").as("doc_id"))
        batchSigs.join(dupIds, Seq("doc_id"), "left_anti")
          .persist(StorageLevel.MEMORY_AND_DISK)
      case None => batchSigs
    }
    val (pairs, bands) =
      pairsFromShingleSigsWithHandle(rem, NumHashes / NumBands, threshold, cap)
    // connectedComponents is eager (its size probe + local/checkpointed
    // result), so by the next line the band cache is fully consumed
    val nonCanonical = connectedComponents(
      pairs.select(col("doc_a"), col("doc_b")))
      .filter(col("node") =!= col("component"))
      .select(col("node").as("doc_id"))
    if (releaseIntermediate) bands.unpersist()
    val keep = rem.join(nonCanonical, Seq("doc_id"), "left_anti")
    if (releaseIntermediate && storeSigs.nonEmpty) {
      // rem is this call's own persist (the bootstrap path reuses the
      // caller's batchSigs) — swap it for the materialized keepers
      val k = keep.persist(StorageLevel.MEMORY_AND_DISK)
      k.count()
      rem.unpersist()
      k
    } else keep
  }

  /** Sequential dedup ingest, pure-DataFrame form: split `docs` into
    * `nBatches` arrival waves by `doc_id % nBatches` and run [[ingestTick]]
    * for each in order — every wave is deduplicated against everything kept
    * so far plus itself, exactly the greedy first-arrival-wins contract of
    * a corpus that grows batch by batch. Output: (doc_id, batch_id) of the
    * kept documents.
    *
    * NEAR-dup scope only: exact copies of shingle-less docs (< [[ShingleK]]
    * tokens) pass through — they have null bands and never co-bucket, so
    * the jaccard-1.0 path never sees them. A caller that needs exact
    * dedup of tiny docs runs an explicit text-keyed pass first, as
    * [[Corpus.corpusPipelineIncremental]] does.
    *
    * Scale: each tick's keepers are persisted and the store is their union,
    * so tick i re-reads cached signature partitions, never recomputes the
    * history. Each wave persists ITS OWN signature slice (measured
    * deliberately: a single all-waves signature cache re-scanned by every
    * per-wave reference read slower at sf0.1 than per-wave slices — the
    * slice cache is what each tick's 3–4 references actually touch).
    * Keeper lineage truncation is `localCheckpoint` (eager, cut to cached
    * blocks), not a durable checkpoint: the fold is a single-plan
    * in-memory loop whose keepers are metadata-sized, and the per-wave
    * durable write+re-read was pure fixed cost. EVERY wave truncates,
    * including the last — the keepers union is replicated across each
    * downstream consumer's plan (a funnel repeats it once per stage), and
    * one untruncated ingest DAG embedded there multiplies plan-STRING
    * rendering (listener events, AQE re-planning) into minutes of driver
    * CPU at sf0.1; measured, not hypothetical. FAULT-TOLERANCE TRADE,
    * explicit: localCheckpoint blocks live executor-local with lineage
    * truncated, so an executor loss (decommission, dynamic allocation,
    * spot preemption) makes them unrecoverable and fails the ingest job
    * instead of recomputing — this in-memory form must not run with
    * dynamic allocation or preemptible executors. The crash-tolerant
    * production form of the same loop is [[SignatureStore.ingestBatch]]
    * (store = a staged snapshot, each tick appends — durable by
    * construction); this in-memory form exists for single-plan use and as
    * the oracle-checkable contract the store-backed loop is spec-tested
    * against.
    */
  def sequentialIngest(docs: DataFrame, nBatches: Int = 3,
                       threshold: Double = 0.5,
                       cap: Int = MaxBucketSize): DataFrame = {
    require(nBatches >= 1, s"nBatches must be >= 1, got $nBatches")
    ensureCheckpointDir(docs)
    var store: Option[DataFrame] = None
    val kept = (0 until nBatches).map { i =>
      val batchSigs = shingleSignatures(
        docs.filter(col("doc_id") % nBatches === i))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // LAZY localCheckpoint: the plan truncation (the point of the
      // checkpoint — see the scaladoc) happens at construction either way;
      // eager=false just folds the keeper materialization into the next
      // consuming action instead of paying a dedicated job per wave
      val keep = ingestTick(batchSigs, store, threshold, cap)
        .localCheckpoint(false)
      store = Some(store.map(_.union(keep)).getOrElse(keep))
      keep.select(col("doc_id"), lit(i.toLong).as("batch_id"))
    }
    kept.reduce(_.union(_))
  }

  /** Canonical-document selection per near-dup group — the step a corpus
    * build runs AFTER grouping: instead of [[Corpus.cleanCorpusStats]]'s
    * keep-the-minimum rule, keep the highest-[[TextOps.qualityScore]] member
    * (ties → lowest doc_id, so selection is total and deterministic).
    * Output per component: the canonical doc, member count, and the winning
    * quality score.
    *
    * Scale shape: the group frame is tiny relative to the corpus (only docs
    * in ≥1 pair enter components), the quality join is keyed on doc_id, and
    * the argmax is a single `max_by` over a struct ordering — one groupBy,
    * no window sort. The 4-dp-rounded score is bit-identical in both
    * engines, so the tie rule fires at exactly the same boundaries.
    */
  def canonicalDocs(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    val groups = dedupGroups(docs, threshold)
    val quality = docs.select(col("doc_id"),
      TextOps.qualityScore(col("text")).as("__q"))
    groups.join(quality, groups("node") === quality("doc_id"))
      .groupBy(col("component"))
      .agg(
        max_by(col("node"), struct(col("__q"), (-col("node")).as("neg")))
          .as("canonical_doc"),
        count(lit(1)).as("n_members"),
        max(col("__q")).as("best_quality"))
  }

  /** 64-bit SimHash over distinct whitespace tokens, emitted as a 64-char
    * '0'/'1' string (portable across engines — no integer hash needed). Bit b
    * (hex digit p = b/4, bit j = 3-b%4 of that digit) is 1 when the sum of
    * ±1 token contributions is positive.
    */
  def simhash(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(array_distinct(TextOps.tokens(col("text")))).as("tok"))
      .withColumn("h", md5(col("tok")))
    // the 16 hex DIGITS are staged once per token row: inlined, each of
    // the 64 per-bit aggregate children re-ran its own conv(substring(h))
    // — 64 string slices + base conversions per token where 16 suffice
    // (each digit feeds 4 bits; the remaining per-bit work is two integer
    // ops). Same expressions semantically, same aggregate values.
    val digits = toks.select(col("doc_id") +: (0 until 16).map(p =>
      conv(substring(col("h"), p + 1, 1), 16, 10).cast("int").as(s"d_$p")): _*)
    val bitSums = (0 until 64).map { b =>
      val p = b / 4
      val j = 3 - b % 4
      val bit = shiftright(col(s"d_$p"), j).bitwiseAND(1)
      sum(when(bit === 1, 1).otherwise(-1)).as(s"s_$b")
    }
    digits.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        concat((0 until 64).map(b =>
          when(col(s"s_$b") > 0, "1").otherwise("0")): _*).as("simhash_bits"))
  }
}
