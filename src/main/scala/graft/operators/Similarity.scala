package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`Array[Float]` vectors):
  * brute-force cosine top-k as the correctness baseline, and an IVF
  * (inverted-file) variant as the scale path — assign every vector to its
  * nearest centroid, then search only the query's cluster.
  *
  * Numeric parity: embeddings are cast element-wise to double, dot products
  * and norms are explicit LEFT-TO-RIGHT folds (`aggregate` with 0.0 init ↔
  * DuckDB `list_reduce`), so both engines run the identical IEEE-754
  * operation sequence and results compare bit-exact.
  *
  * Scale design: queries (and centroids) are tiny → broadcast; the big side
  * streams through map-side cosine scoring, and per-query top-k is a
  * window over (query, cosine desc) — with k small this is a partial top-k
  * per partition under AQE, never a global sort of the corpus. IVF cuts the
  * scored candidates by the cluster fan-out (here 8 clusters → 8× fewer
  * score evaluations at the same recall trade-off as any IVF index).
  */
object Similarity {

  /** Element-wise double vector from the float embedding. */
  private def dvec(c: Column): Column = transform(c, x => x.cast("double"))

  /** Left-to-right dot product: the codegen'd [[graft.functions.DotProduct]]
    * kernel (same IEEE fold order as the declarative
    * `aggregate(zip_with(...))` form, ~10× faster on O(n²) scoring).
    */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine of two pre-normalized (unit) vectors: a single fold per pair. */
  def cosine(ua: Column, ub: Column): Column = dot(ua, ub)

  /** Unit vectors, normalized ONCE per vector — every pairwise cosine is then
    * one dot product instead of three (the norms would otherwise be re-folded
    * for each of the O(n²) pairs). The oracle mirrors the same
    * normalize-then-dot sequence for bit parity. Registers the native kernel
    * on the input's session (idempotent).
    */
  private def vectors(emb: DataFrame): DataFrame = {
    graft.functions.VectorExpressions.register(emb.sparkSession)
    emb.select(col("vec_id"), dvec(col("embedding")).as("v"))
      .withColumn("n", norm(col("v")))
      .select(col("vec_id"), transform(col("v"), x => x / col("n")).as("v"))
  }

  /** Brute-force cosine top-k: every query (vec_id < nQueries) scored against
    * the full corpus. The baseline every ANN variant is measured against.
    */
  def annBruteForce(emb: DataFrame, nQueries: Int = 8, k: Int = 5): DataFrame = {
    val e = vectors(emb)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("qv"), col("v")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"), col("cosine"))
  }

  /** IVF cluster assignment: nearest (max-cosine) of the first `nCentroids`
    * vectors, ties broken by centroid id. Output: vec_id → centroid_id.
    */
  def ivfAssign(emb: DataFrame, nCentroids: Int = 8): DataFrame =
    ivfAssignFrom(vectors(emb), nCentroids)

  private def ivfAssignFrom(e: DataFrame, nCentroids: Int): DataFrame = {
    val cents = e.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("centroid_id"), col("v").as("cv"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos_c").desc, col("centroid_id"))
    e.crossJoin(broadcast(cents))
      .withColumn("cos_c", cosine(col("cv"), col("v")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("centroid_id"), col("cos_c").as("centroid_cosine"))
  }

  /** IVF top-k: queries are the centroids themselves (their cluster is their
    * own id), searched only within their cluster's vectors. One shared
    * normalized frame feeds assignment, membership, and queries.
    */
  def annIvf(emb: DataFrame, nCentroids: Int = 8, k: Int = 5): DataFrame = {
    val e = vectors(emb)
    val assigned = ivfAssignFrom(e, nCentroids)
      .select(col("vec_id"), col("centroid_id"))
    val members = e.join(assigned, "vec_id")
    val q = e.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    members.join(broadcast(q), col("centroid_id") === col("query_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("qv"), col("v")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"), col("cosine"))
  }

  /** Embedding near-duplicate pairs: all pairs with cosine ≥ threshold.
    * Local baseline is the quadratic join; at scale the same verification
    * kernel runs on LSH/IVF candidate buckets instead (see [[lshNearDups]]).
    */
  def embeddingNearDups(emb: DataFrame, threshold: Double = 0.4): DataFrame = {
    val e = vectors(emb)
    val b = e.select(col("vec_id").as("vec_b"), col("v").as("vb"))
    e.join(b, col("vec_id") < col("vec_b"))
      .withColumn("cosine", cosine(col("v"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select(col("vec_id").as("vec_a"), col("vec_b"), col("cosine"))
  }

  /** Deterministic random hyperplanes for sign-LSH: component (j, i) is an
    * md5-derived value in [-1, 1) — reproducible in SQL text form, so the
    * DuckDB oracle uses the IDENTICAL constants.
    */
  val NumPlanes = 12
  val Dim = 64
  def hyperplaneSeq(n: Int): Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until n).map { j =>
      (0 until Dim).map { i =>
        val h = md.digest(s"$j:$i".getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(h, 16).toDouble / 4294967296.0 * 2 - 1
      }
    }
  }
  lazy val hyperplanes: Seq[Seq[Double]] = hyperplaneSeq(NumPlanes)

  /** Banded sign-LSH layout: NumSimBands bands × BandBits sign bits each
    * (48 planes total, a superset of [[hyperplanes]] under the same md5
    * derivation). Band count is the recall knob (any shared band → candidate);
    * bits-per-band is the bucket-granularity knob — it grows with
    * log(corpus) to hold expected bucket size flat at 100 TB.
    */
  val NumSimBands = 4
  val BandBits = 12
  lazy val bandPlanes: Seq[Seq[Double]] = hyperplaneSeq(NumSimBands * BandBits)

  /** Sign-LSH bucket expression over a normalized-vector column: bit j =
    * (v · w_j) > 0, as a NumPlanes-char '0'/'1' string.
    */
  private def bucketExpr(v: Column): Column =
    concat(hyperplanes.map { w =>
      when(dot(v, array(w.map(lit): _*)) > 0, "1").otherwise("0")
    }: _*)

  /** Sign-LSH bucket of every vector. Map-side only. */
  def lshBuckets(emb: DataFrame): DataFrame =
    vectors(emb).select(col("vec_id"), bucketExpr(col("v")).as("bucket"))

  /** LSH-bucketed near-dup pairs — the 100 TB path: candidates share a
    * bucket (shuffle keyed on the bucket, no quadratic join), then the exact
    * cosine verifies. Recall trades off against NumPlanes like any sign-LSH.
    * Buckets derive from the SAME normalized frame (one scan, one
    * normalization pass — a separate lshBuckets join would scan twice).
    * Degenerate buckets (all-zero vectors, boilerplate embeddings) are
    * dropped beyond `cap` docs — same skew guard as the MinHash band joins.
    */
  def lshNearDups(emb: DataFrame, threshold: Double = 0.4,
                  cap: Int = Dedup.MaxBucketSize): DataFrame = {
    val e = Dedup.capBuckets(
      vectors(emb).withColumn("bucket", bucketExpr(col("v"))), Seq("bucket"), cap)
    val b = e.select(col("bucket"), col("vec_id").as("vec_b"), col("v").as("vb"))
    e.join(b, Seq("bucket"))
      .filter(col("vec_id") < col("vec_b"))
      .withColumn("cosine", cosine(col("v"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select(col("vec_id").as("vec_a"), col("vec_b"), col("bucket"), col("cosine"))
  }

  /** Banded sign-LSH near-dup pairs — the registered replacement for the
    * all-pairs exact join (which stays as a spec-only baseline): vectors
    * sharing ANY of the [[NumSimBands]] 12-bit sign bands become candidates
    * (Σ bucket² work per band, bucket-capped), then the exact cosine
    * verifies against `threshold`. The candidate stream carries only ids —
    * the 64-double vectors are joined back per distinct pair, so the band
    * explode never multiplies vector payloads.
    */
  def embeddingNearDupsBanded(emb: DataFrame, threshold: Double = 0.4,
                              cap: Int = Dedup.MaxBucketSize): DataFrame = {
    val e = vectors(emb)
    val sig = concat(bandPlanes.map { w =>
      when(dot(col("v"), array(w.map(lit): _*)) > 0, "1").otherwise("0")
    }: _*)
    val bandCols = (0 until NumSimBands).map(b =>
      struct(lit(b).as("band_id"),
        substring(col("sig"), b * BandBits + 1, BandBits).as("band_val")))
    val buckets = e.withColumn("sig", sig)
      .select(col("vec_id"), explode(array(bandCols: _*)).as("band"))
      .select(col("vec_id"), col("band.band_id"), col("band.band_val"))
    val capped = Dedup.capBuckets(buckets, Seq("band_id", "band_val"), cap)
    val pairs = capped.as("a")
      .join(capped.as("b"),
        col("a.band_id") === col("b.band_id")
          && col("a.band_val") === col("b.band_val")
          && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    val va = e.select(col("vec_id").as("vec_a"), col("v").as("va"))
    val vb = e.select(col("vec_id").as("vec_b"), col("v").as("vb"))
    pairs.join(va, "vec_a").join(vb, "vec_b")
      .withColumn("cosine", cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
  }

  /** Scalar (per-dimension min/max) 8-bit quantization — the memory scale
    * path for ANN: a float corpus shrinks 4× (further with int8 SIMD
    * scoring downstream), at a bounded reconstruction error of
    * (mx−mn)/255 per dimension. Two jobs at any scale: (1) one
    * posexplode → per-dimension min/max aggregate (shuffle keyed by
    * dimension index — output rows = dimensionality, trivial), (2) one
    * map-side pass quantizing every vector against the 1-row bounds frame
    * (broadcast via crossJoin). Constant dimensions quantize to 0.
    *
    * Integer outputs only, and the scale arithmetic is the same
    * double-precision expression in both engines, so the oracle
    * hash-compare is exact.
    */
  /** 1-row frame of per-dimension (min, max) arrays indexed by dimension —
    * one posexplode → dimension-keyed aggregate; output rows =
    * dimensionality, so the frame broadcasts at any corpus size.
    */
  private def quantBounds(emb: DataFrame): DataFrame =
    emb.select(posexplode(col("embedding")).as(Seq("dim", "xf")))
      .select(col("dim"), col("xf").cast("double").as("x"))
      .groupBy(col("dim")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      // arrays indexed by dimension: struct sort puts (dim, bound) in order
      .agg(
        transform(array_sort(collect_list(struct(col("dim"), col("mn")))),
          s => s("mn")).as("__mns"),
        transform(array_sort(collect_list(struct(col("dim"), col("mx")))),
          s => s("mx")).as("__mxs"))

  def quantizeEmbeddings(emb: DataFrame): DataFrame =
    emb.crossJoin(quantBounds(emb))
      .select(col("vec_id"),
        transform(col("embedding"), (x, i) => {
          val mn = element_at(col("__mns"), i + 1)
          val mx = element_at(col("__mxs"), i + 1)
          when(mx === mn, lit(0L))
            .otherwise(floor((x.cast("double") - mn) / (mx - mn) * lit(255.0)))
        }).as("qvec"))

  /** ANN over the quantized corpus — asymmetric distance: full-precision
    * queries score against bin-center dequantized int8 codes (the standard
    * SQ/PQ search form; the corpus holds 1/4 the bytes, the query loses no
    * precision). Same broadcast-queries × map-side-scoring shape as
    * [[annBruteForce]]; recall loss is bounded by the per-dimension
    * half-bin error (mx−mn)/510.
    */
  def annQuantized(emb: DataFrame, nQueries: Int = 8, k: Int = 5): DataFrame = {
    graft.functions.VectorExpressions.register(emb.sparkSession)
    val deq = quantizeEmbeddings(emb).crossJoin(quantBounds(emb))
      .select(col("vec_id"),
        transform(col("qvec"), (q, i) => {
          val mn = element_at(col("__mns"), i + 1)
          val mx = element_at(col("__mxs"), i + 1)
          when(mx === mn, mn)
            .otherwise(mn + (q.cast("double") + lit(0.5)) * (mx - mn) / lit(255.0))
        }).as("dv"))
    val c = deq.withColumn("n", norm(col("dv")))
      .select(col("vec_id"), transform(col("dv"), x => x / col("n")).as("v"))
    val q = vectors(emb).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    c.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("qv"), col("v")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"), col("cosine"))
  }
}
