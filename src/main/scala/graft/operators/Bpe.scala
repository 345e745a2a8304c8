package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING (Sennrich et al. 2016) as
  * vocabulary-bounded DataFrame rounds — the tokenizer-side capability of a
  * training-data pipeline (the reference has no text surface; this is
  * builder-prompt scope, like the other curation operators).
  *
  * The scale insight: after ONE corpus aggregate (token → frequency), every
  * merge round operates on the WORD TABLE, which is vocabulary-bounded
  * (Heaps' law), not corpus-bounded — at 100 TB the corpus is scanned once,
  * and each merge round is a sub-second job over a few million distinct
  * words regardless of corpus size. Per driver round: adjacent-pair counts
  * (freq-weighted explode + one agg), a top-[[MaxBatch]] candidate collect
  * plus two vocab-bounded per-symbol maxima (bounded metadata, the
  * [[Similarity.trainCentroids]] precedent), and ONE map-side literal
  * `replace` chain applying the whole provably-safe merge batch — so a
  * production 50k-vocab run needs ~50000/batch driver round-trips, not
  * 50000 (see [[trainMerges]] for the exactness argument).
  *
  * Symbol encoding: each symbol is wrapped in single spaces and symbols
  * are concatenated, so neighbors are separated by a DOUBLE space
  * (" a  b  c "). A merge replaces " l  r " with " lr " — adjacent
  * occurrences share no characters, so the engines' standard left-to-right
  * non-overlapping `replace` applies the merge greedily ("a a a a" →
  * "aa aa", the BPE contract) and preserves the wrapping invariant.
  * Tokens are whitespace-split upstream, so no symbol can contain the
  * separator. Empty tokens are excluded (the engines' empty-string char
  * splits agree but carry no pairs). Ties break (count desc, left asc,
  * right asc) — codepoint string order on both engines.
  *
  * The DuckDB oracle unrolls the same rounds as CTEs (the [[OraclesML]]
  * k-means precedent), so the learned merge table is differentially
  * tested end-to-end.
  */
object Bpe {

  val NumMerges = 8

  /** Merges taken per driver round at most (top-`MaxBatch` pairs are
    * collected as candidates; the provably-safe prefix is applied).
    */
  val MaxBatch = 32

  /** Word-table lineage is truncated every this many rounds: each round
    * stacks one nested `replace` per applied merge onto the plan, and past
    * ~a thousand expression nodes analysis cost dominates the (sub-second)
    * vocab-bounded job itself.
    */
  val CheckpointEvery = 32

  private def wordTable(docs: DataFrame): DataFrame =
    docs
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(
        concat(lit(" "), concat_ws("  ", split(col("w"), "")), lit(" "))
          .as("sym"),
        col("freq"))

  /** Freq-weighted adjacent-pair counts of a word table — the per-round
    * aggregate both the batched trainer and the spec's sequential
    * reference derive from.
    */
  private def pairCounts(cur: DataFrame): DataFrame = {
    // symbol array staged before the pair lambda (the TextOps.tokens()
    // evaluation contract): captured, the split re-ran per adjacent pair —
    // bounded here by word length, but the idiom stays linear everywhere
    val syms = col("__syms")
    cur
      .select(col("freq"), split(trim(col("sym")), "  ").as("__syms"))
      .select(col("freq"),
        explode(when(size(syms) >= 2,
          transform(sequence(lit(1), size(syms) - 1),
            i => struct(element_at(syms, i).as("l"),
              element_at(syms, i + 1).as("r"))))
          .otherwise(array().cast("array<struct<l:string,r:string>>")))
          .as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("cnt"))
  }

  private def applyReplace(cur: DataFrame,
                           batch: Seq[(String, String)]): DataFrame =
    cur.select(
      batch.foldLeft(col("sym")) { case (c, (l, r)) =>
        call_function("replace", c, lit(s" $l  $r "), lit(s" $l$r "))
      }.as("sym"),
      col("freq"))

  /** The learned merge table: (merge_rank, left, right, merged,
    * pair_count), one row per merge in learn order — BYTE-IDENTICAL to the
    * one-merge-per-round sequential algorithm (the DuckDB oracle unrolls
    * that form), but taking up to [[MaxBatch]] merges per driver round.
    *
    * Why a batch is exact: candidates are the sorted (cnt DESC, l, r)
    * top-N of ONE round's pair counts, and a strictly CONTIGUOUS prefix is
    * taken where each successive pick p_i (i ≥ 2)
    *
    *  1. has l, r AND its merged string l+r all disjoint from every
    *     earlier pick's {l, r, merged} — so no earlier merge in the batch
    *     changes cnt(p_i), the replace patterns are disjoint (application
    *     order is immaterial), and no two picks mint the same new symbol
    *     (whose new-pair counts would add and escape bound 2);
    *  2. has cnt(p_i) STRICTLY above the new-pair bound of every earlier
    *     pick p_j: a pair born of merge j is (x, m_j) or (m_j, y), and
    *     each of its occurrences consumed an (x, l_j) / (r_j, y)
    *     occurrence, so its count is ≤ maxIn(l_j) = max cnt over (•, l_j)
    *     resp. maxOut(r_j) — both read off the SAME round's pair table;
    *  3. stops the batch after any pick whose merged string collides with
    *     an existing pair-bearing symbol (then new occurrences ADD to that
    *     symbol's pair counts and bound 2 no longer caps them).
    *
    * Contiguity handles decreased pairs (anything outranking p_i in the
    * old order is an earlier pick — decreases can only push pairs down),
    * so by induction the sequential argmax of round i is exactly p_i with
    * its recorded count. At 100 TB the shape is unchanged — the corpus is
    * still scanned once; this cuts driver round-trips (the round-6/7
    * flag) by the realized batch factor, and [[CheckpointEvery]] bounds
    * plan growth for production-size (50k-vocab) runs.
    */
  def trainMerges(docs: DataFrame, numMerges: Int = NumMerges): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = wordTable(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cur = words
    var round = 0
    var exhausted = false
    val merges = Seq.newBuilder[(Long, String, String, String, Long)]
    var nTaken = 0
    while (nTaken < numMerges && !exhausted) {
      round += 1
      val pairs = pairCounts(cur)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val top = pairs.orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(math.min(MaxBatch, numMerges - nTaken)).collect()
      if (top.isEmpty) { exhausted = true; pairs.unpersist() }
      else {
        // per-symbol maxima for bound 2 + the pair-bearing symbol set for
        // rule 3 — vocab-bounded metadata (chars + learned merges), the
        // same driver-side scale class as the centroid collects. BOTH
        // maxima come from ONE exploded aggregate + ONE collect (they were
        // two separate jobs over the same cached pair table — identical
        // values, half the round's fixed action cost)
        val mx = pairs.select(explode(array(
            struct(lit("i").as("side"), col("r").as("sym"), col("cnt")),
            struct(lit("o").as("side"), col("l").as("sym"), col("cnt"))))
            .as("e"))
          .groupBy(col("e.side").as("side"), col("e.sym").as("sym"))
          .agg(max(col("e.cnt")).as("m"))
          .collect()
        val maxIn = mx.filter(_.getString(0) == "i")
          .map(w => w.getString(1) -> w.getLong(2)).toMap
        val maxOut = mx.filter(_.getString(0) == "o")
          .map(w => w.getString(1) -> w.getLong(2)).toMap
        pairs.unpersist()
        val symbolSet = maxIn.keySet ++ maxOut.keySet
        var used = Set.empty[String]
        var bound = Long.MinValue
        var stopped = false
        val batch = Seq.newBuilder[(String, String, Long)]
        var i = 0
        while (i < top.length && !stopped) {
          val (l, r, cnt) =
            (top(i).getString(0), top(i).getString(1), top(i).getLong(2))
          // the merged string must be fresh too: two symbol-disjoint picks
          // can still merge to the SAME string (("a","bc") and ("ab","c")
          // both yield "abc"), and their new-pair counts would then ADD —
          // rule 2's per-pick bound no longer caps the union
          val take = i == 0 ||
            (!used.contains(l) && !used.contains(r) && !used.contains(l + r)
              && cnt > bound)
          if (!take) stopped = true
          else {
            batch += ((l, r, cnt))
            val m = l + r
            used ++= Set(l, r, m)
            bound = math.max(bound,
              math.max(maxIn.getOrElse(l, Long.MinValue),
                maxOut.getOrElse(r, Long.MinValue)))
            if (symbolSet.contains(m)) stopped = true
          }
          i += 1
        }
        val taken = batch.result()
        taken.foreach { case (l, r, cnt) =>
          nTaken += 1
          merges += ((nTaken.toLong, l, r, l + r, cnt))
        }
        cur = applyReplace(cur, taken.map(t => (t._1, t._2)))
        if (round % CheckpointEvery == 0)
          cur = cur.localCheckpoint(true)
      }
    }
    merges.result().toDF("merge_rank", "lhs", "rhs", "merged", "pair_count")
  }

  /** The one-merge-per-driver-round reference implementation — the form
    * the DuckDB oracle unrolls. Kept (test scope) as the differential
    * witness that the batched [[trainMerges]] is byte-identical.
    */
  private[graft] def trainMergesSequential(docs: DataFrame,
                                           numMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = wordTable(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cur = words
    val merges = Seq.newBuilder[(Long, String, String, String, Long)]
    for (r <- 1 to numMerges) {
      val top = pairCounts(cur).orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.nonEmpty) {
        val (l, rr, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r.toLong, l, rr, l + rr, cnt))
        cur = applyReplace(cur, Seq((l, rr)))
        if (r % CheckpointEvery == 0) cur = cur.localCheckpoint(true)
      }
    }
    merges.result().toDF("merge_rank", "lhs", "rhs", "merged", "pair_count")
  }

  /** Tokenization under a learned merge table — the APPLY side: every
    * document's tokens are re-segmented by replaying the merges in rank
    * order (the standard BPE inference rule), then per-doc BPE token
    * counts summarize the segmentation. Merges arrive as driver-side
    * literals (the merge table is tokenizer metadata, ≪ data scale), so
    * application is one map-side expression chain per document — no join,
    * no shuffle beyond the final doc aggregate.
    */
  def applyMerges(docs: DataFrame,
                  merges: Seq[(String, String)]): DataFrame = {
    // explode + a flat nested-replace chain keeps the whole merge replay
    // inside whole-stage codegen (a transform() lambda chain would run
    // interpreted per element — the graft_run_stats lesson); one doc-keyed
    // aggregate closes it
    val enc = concat(lit(" "),
      concat_ws("  ", split(col("tok"), "")), lit(" "))
    val merged = merges.foldLeft(enc) { case (c, (l, r)) =>
      call_function("replace", c, lit(s" $l  $r "), lit(s" $l$r "))
    }
    docs.select(col("doc_id"),
      explode(TextOps.tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
      .select(col("doc_id"),
        size(split(trim(merged), "  ")).cast("long").as("__n"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("__n")).as("n_bpe_tokens"))
  }
}
