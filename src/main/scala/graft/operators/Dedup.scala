package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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

  /** Exact dedup: group identical texts by md5, keep the lowest doc_id
    * (deterministic survivor), report group size.
    */
  def exactDedup(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))

  private def docShingles(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      array_distinct(Shingles.shingles(TextOps.tokens(col("text")), ShingleK))
        .as("shingles"))

  /** MinHash signatures: NumHashes seeded-md5 minima per document, plus the
    * NumBands banded bucket hashes for LSH. Entirely map-side.
    */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    val sigs = (0 until NumHashes).map { j =>
      array_min(transform(col("shingles"),
        s => md5(concat(lit(j.toString), lit(":"), s)))).as(s"sig_$j")
    }
    val withSigs = docShingles(docs).select(col("doc_id") +: sigs: _*)
    val bands = (0 until NumBands).map { b =>
      val rows = NumHashes / NumBands
      // concat (NOT concat_ws): null sigs — a doc with < ShingleK tokens —
      // must propagate to a null band like the oracle's `||`, so shingle-less
      // docs never co-bucket (concat_ws would give them all md5(""))
      val parts = (b * rows until (b + 1) * rows).map(j => col(s"sig_$j"))
      md5(concat(parts.flatMap(c => Seq(c, lit("|"))).dropRight(1): _*))
        .as(s"band_$b")
    }
    withSigs.select(col("doc_id") +:
      (0 until NumHashes).map(j => col(s"sig_$j")) ++: bands: _*)
  }

  /** MinHash LSH candidate pairs + exact-Jaccard verification: docs sharing
    * any band bucket are candidates; candidates are verified against the true
    * shingle-set Jaccard and kept when ≥ `threshold`.
    */
  def minhashLshPairs(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    val sigs = minhashSignatures(docs)
    val bandCols = (0 until NumBands).map(b =>
      struct(lit(b).as("band_id"), col(s"band_$b").as("band_hash")))
    val buckets = sigs.select(col("doc_id"),
      explode(array(bandCols: _*)).as("band"))
      .select(col("doc_id"), col("band.band_id"), col("band.band_hash"))
    val pairs = buckets.as("a")
      .join(buckets.as("b"),
        col("a.band_id") === col("b.band_id")
          && col("a.band_hash") === col("b.band_hash")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    verifyJaccard(pairs, docShingles(docs), threshold)
  }

  /** n-gram Jaccard dedup with cheap blocking (lang, length bucket) instead
    * of LSH: exercises the same verification kernel on a different candidate
    * generator.
    */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double = 0.3): DataFrame = {
    val blocked = docs.select(col("doc_id"),
      struct(col("lang"), floor(col("n_chars") / 50).as("len_bucket")).as("blk"))
    val pairs = blocked.as("a")
      .join(blocked.as("b"),
        col("a.blk") === col("b.blk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    verifyJaccard(pairs, docShingles(docs), threshold)
  }

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
    spread.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("n_common", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("n_union", size(array_union(col("sa"), col("sb"))).cast("long"))
      // n_union=0 (two shingle-less docs): guard the division (ANSI would
      // throw) and drop the pair on both engines (oracle has the same
      // n_union > 0 condition — DuckDB's 0.0/0 is NaN, which its >= keeps!)
      .withColumn("jaccard",
        when(col("n_union") > 0, col("n_common").cast("double") / col("n_union")))
      .filter(col("n_union") > 0 && col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("n_union"), col("jaccard"))
  }

  /** SimHash near-dup pairs: candidates must agree on the first
    * `blockBits` of the signature (the banding trick — at scale this is the
    * shuffle key, never an all-pairs join), then full 64-bit Hamming
    * distance ≤ `maxDist` confirms. Hamming is a 64-term generated
    * expression over the portable bit-string signatures.
    */
  def simhashPairs(docs: DataFrame, blockBits: Int = 16, maxDist: Int = 8): DataFrame = {
    val sigs = simhash(docs)
    val a = sigs.select(col("doc_id").as("doc_a"), col("simhash_bits").as("bits_a"))
      .withColumn("blk", substring(col("bits_a"), 1, blockBits))
    val b = sigs.select(col("doc_id").as("doc_b"), col("simhash_bits").as("bits_b"))
      .withColumn("blk", substring(col("bits_b"), 1, blockBits))
    val hamming = (1 to 64).map(i =>
      when(substring(col("bits_a"), i, 1) =!= substring(col("bits_b"), i, 1), 1)
        .otherwise(0)).reduce(_ + _)
    a.join(b, Seq("blk"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming", hamming.cast("long"))
      .filter(col("hamming") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Connected components over a pair graph by iterative min-label
    * propagation (each node repeatedly adopts the smallest label among
    * itself and its neighbors until fixpoint — iterations ≈ graph diameter,
    * each one join + one aggregate; lineage checkpointed per round so plans
    * stay linear). The distributed union-find for duplicate GROUPS: LSH
    * gives pairs, this gives clusters with the min doc_id as the canonical
    * survivor.
    */
  def connectedComponents(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(edges.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint(true)
    var labels = sym.select(col("src").as("node"), col("src").as("lbl"))
      .distinct().localCheckpoint(true)
    var converged = false
    while (!converged) {
      val viaNeighbor = sym
        .join(labels.withColumnRenamed("node", "dst"), "dst")
        .select(col("src").as("node"), col("lbl"))
      val next = labels.union(viaNeighbor)
        .groupBy("node").agg(min(col("lbl")).as("lbl"))
        .localCheckpoint(true)
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

  /** 64-bit SimHash over distinct whitespace tokens, emitted as a 64-char
    * '0'/'1' string (portable across engines — no integer hash needed). Bit b
    * (hex digit p = b/4, bit j = 3-b%4 of that digit) is 1 when the sum of
    * ±1 token contributions is positive.
    */
  def simhash(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(array_distinct(TextOps.tokens(col("text")))).as("tok"))
      .withColumn("h", md5(col("tok")))
    val bitSums = (0 until 64).map { b =>
      val p = b / 4
      val j = 3 - b % 4
      val d = conv(substring(col("h"), p + 1, 1), 16, 10).cast("int")
      val bit = shiftright(d, j).bitwiseAND(1)
      sum(when(bit === 1, 1).otherwise(-1)).as(s"s_$b")
    }
    toks.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        concat((0 until 64).map(b =>
          when(col(s"s_$b") > 0, "1").otherwise("0")): _*).as("simhash_bits"))
  }
}
