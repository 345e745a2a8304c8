package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stage EXPENSIVE derived columns behind an `explode(array(struct(…)))`
  * generate barrier so each is evaluated exactly once per row.
  *
  * Why a Generate and not a plain projection: predicate pushdown
  * substitutes filter conditions below projections by INLINING the alias
  * definitions (and a filter directly above a join is folded into the join
  * condition the same way), so a `withColumn("x", expensive).filter($"x" …)`
  * chain evaluates `expensive` once in the pushed Filter/Join condition and
  * again in the Project that emits the column — the optimization guide's
  * duplicated-evaluation shape (§4.4), which also hit the payload decoders
  * (from_json ×3, see PayloadDecode) and the Jaccard verification kernel
  * (array_union ×3 / array_intersect ×2 per candidate pair, measured in
  * plans/r15). A Generate's output attributes cannot be substituted below
  * it, so filters stay above and test the materialized value.
  * `explode(array(struct(…)))` emits exactly one row per input row (a
  * 1-element array), so row semantics are untouched; whole-stage codegen
  * handles Generate, so the barrier itself costs nothing measurable.
  */
private[graft] object Staged {
  /** `keep` input columns pass through by name; `staged` (name → expr)
    * are computed once inside the Generate and come back as plain
    * attributes.
    */
  def once(df: DataFrame, keep: Seq[String],
           staged: Seq[(String, Column)]): DataFrame =
    df.select(keep.map(col) :+
        explode(array(struct(staged.map { case (n, c) => c.as(n) }: _*)))
          .as("__staged"): _*)
      .select(keep.map(col) ++
        staged.map { case (n, _) => col(s"__staged.$n").as(n) }: _*)
}
