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
  * and the 8 merge rounds are each a sub-second job over a few million
  * distinct words regardless of corpus size. Per round: adjacent-pair
  * counts (freq-weighted explode + one agg), a 1-row argmax collect
  * (bounded metadata, the [[Similarity.trainCentroids]] precedent), and a
  * map-side literal `replace` applying the merge.
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

  /** The learned merge table: (merge_rank, left, right, merged,
    * pair_count), one row per round in learn order.
    */
  def trainMerges(docs: DataFrame, numMerges: Int = NumMerges): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(
        concat(lit(" "), concat_ws("  ", split(col("w"), "")), lit(" "))
          .as("sym"),
        col("freq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cur = words
    val merges = Seq.newBuilder[(Long, String, String, String, Long)]
    for (r <- 1 to numMerges) {
      val syms = split(trim(col("sym")), "  ")
      val pairs = cur
        .select(col("freq"),
          explode(when(size(syms) >= 2,
            transform(sequence(lit(1), size(syms) - 1),
              i => struct(element_at(syms, i).as("l"),
                element_at(syms, i + 1).as("r"))))
            .otherwise(array().cast("array<struct<l:string,r:string>>")))
            .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
      val top = pairs.orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.nonEmpty) {
        val (l, rr, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r.toLong, l, rr, l + rr, cnt))
        cur = cur.select(
          call_function("replace",
            col("sym"), lit(s" $l  $rr "), lit(s" ${l + rr} ")).as("sym"),
          col("freq"))
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
