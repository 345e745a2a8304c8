package graft

import graft.operators.{Dedup, TextOps}

/** DuckDB oracle SQL for the training-data-pipeline operators (text
  * analysis, dedup, similarity search). Conventions on top of [[Oracles]]:
  *
  *  - portable hashing: md5 hex strings; lexicographic MIN of the fixed-width
  *    hex == numeric min, so MinHash needs no shared integer hash;
  *  - hex-digit value: Spark `conv(c,16,10)` ↔ DuckDB `strpos('0123…f',c)-1`;
  *  - regexp_replace needs the 'g' flag in DuckDB to match Spark;
  *  - vector math: element-wise cast to double + explicit left-to-right
  *    folds (`list_reduce` ↔ Spark `aggregate` with 0.0 init — identical
  *    IEEE sequence, bit-exact comparison).
  */
object OraclesML {

  // ---- text ----

  private val W = """string_split_regex(text, '\s+')"""

  val tokenCountSql: String =
    s"""SELECT doc_id,
       |  CAST(len($W) AS BIGINT) AS n_ws_tokens,
       |  CAST(len(regexp_extract_all(text, '${TextOps.tokenPattern}')) AS BIGINT) AS n_re_tokens
       |FROM documents""".stripMargin

  private val stopList = TextOps.stopwords.map(s => s"'$s'").mkString(", ")

  val textQualitySql: String =
    s"""WITH m AS (
       |  SELECT doc_id, length(text) AS n,
       |    CAST(len($W) AS BIGINT) AS n_words,
       |    length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS alpha,
       |    length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS punct,
       |    length(regexp_replace(text, '\\s', '', 'g')) AS nonspace,
       |    CAST(len(list_filter($W, x -> x IN ($stopList))) AS BIGINT) AS n_stop
       |  FROM documents)
       |SELECT doc_id, CAST(n AS BIGINT) AS n_chars, n_words,
       |  round_even(CAST(nonspace AS DOUBLE) / n_words, 4) AS mean_word_len,
       |  CASE WHEN n > 0 THEN round_even(CAST(alpha AS DOUBLE) / n, 4) END AS alpha_ratio,
       |  CASE WHEN n > 0 THEN round_even(CAST(punct AS DOUBLE) / n, 4) END AS punct_ratio,
       |  round_even(CAST(n_stop AS DOUBLE) / n_words, 4) AS stopword_ratio,
       |  round_even((CASE WHEN n > 0 THEN round_even(CAST(alpha AS DOUBLE) / n, 4) END) * 0.4
       |    + (1.0 - (CASE WHEN n > 0 THEN round_even(CAST(punct AS DOUBLE) / n, 4) END)) * 0.3
       |    + round_even(CAST(n_stop AS DOUBLE) / n_words, 4) * 0.2
       |    + least(1.0, CAST(n_words AS DOUBLE) / 100) * 0.1, 4) AS quality_score
       |FROM m""".stripMargin

  val langIdSql: String = {
    val scoreDefs = TextOps.langMarkers.map { case (lang, ms) =>
      val list = ms.map(m => s"'$m'").mkString(", ")
      s"CAST(len(list_filter($W, x -> x IN ($list))) AS BIGINT) AS score_$lang"
    }.mkString(",\n    ")
    val scoreCols = TextOps.langMarkers.map { case (l, _) => s"score_$l" }
    val cases = TextOps.langMarkers.map { case (l, _) =>
      s"WHEN score_$l = m AND m > 0 THEN '$l'"
    }.mkString(" ")
    s"""WITH s AS (
       |  SELECT doc_id,
       |    $scoreDefs
       |  FROM documents),
       |g AS (SELECT *, greatest(${scoreCols.mkString(", ")}) AS m FROM s)
       |SELECT doc_id, ${scoreCols.mkString(", ")},
       |  CASE $cases ELSE 'und' END AS predicted_lang
       |FROM g""".stripMargin
  }

  /** 3-word shingles of the token array (matches Shingles.shingles(w, 3)),
    * over any doc-shaped relation (the store oracles shingle SURVIVORS).
    */
  private def shinglesCteFrom(table: String): String =
    s"""shingled AS (
       |  SELECT doc_id, text,
       |    [array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)] AS s
       |  FROM (SELECT doc_id, text, $W AS w FROM $table))""".stripMargin

  private val shinglesCte: String = shinglesCteFrom("documents")

  val fingerprintSql: String =
    s"""WITH $shinglesCte
       |SELECT doc_id, md5(text) AS content_hash,
       |  list_min([md5(x) for x in s]) AS min_shingle_hash,
       |  CAST(len(list_distinct(s)) AS BIGINT) AS n_distinct_shingles
       |FROM shingled""".stripMargin

  val lengthPercentilesSql: String =
    """SELECT lang, count(*) AS n_docs,
      |  round_even(quantile_cont(n_chars, 0.5), 4) AS p50_chars,
      |  round_even(quantile_cont(n_chars, 0.9), 4) AS p90_chars
      |FROM documents GROUP BY 1""".stripMargin

  /** Exact values + literal TRUE for the approx bound checks: the Spark side
    * computes the sketch estimate and asserts it in-bounds, so an
    * out-of-tolerance sketch fails the hash gate like any wrong answer.
    */
  val approxDistinctSql: String =
    """SELECT event_type, count(DISTINCT user_id) AS n_users, TRUE AS approx_ok
      |FROM events GROUP BY 1""".stripMargin

  val approxQuantilesSql: String =
    """SELECT lang, count(*) AS n_docs,
      |  round_even(quantile_cont(n_chars, 0.5), 4) AS p50_chars,
      |  round_even(quantile_cont(n_chars, 0.9), 4) AS p90_chars,
      |  TRUE AS approx_ok
      |FROM documents GROUP BY 1""".stripMargin

  val deterministicSampleSql: String =
    """SELECT doc_id, lang, source, n_chars FROM documents
      |WHERE md5(CAST(doc_id AS VARCHAR)) < '4'""".stripMargin

  val stratifiedSampleSql: String =
    """SELECT doc_id, lang, source, n_chars FROM (
      |  SELECT doc_id, lang, source, n_chars,
      |    row_number() OVER (PARTITION BY lang
      |                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |  FROM documents) t WHERE rn <= 20""".stripMargin

  val valueStatsSql: String = {
    def ds(x: String) = s"CAST(sum(CAST($x AS DECIMAL(38,6))) AS DOUBLE)"
    s"""WITH s AS (
       |  SELECT event_type,
       |    CAST(count(*) AS DOUBLE) AS n,
       |    ${ds("value")} AS sx,
       |    ${ds("value * value")} AS sxx,
       |    ${ds("CAST(props::JSON->>'k' AS DOUBLE)")} AS sy,
       |    ${ds("CAST(props::JSON->>'k' AS DOUBLE) * CAST(props::JSON->>'k' AS DOUBLE)")} AS syy,
       |    ${ds("value * CAST(props::JSON->>'k' AS DOUBLE)")} AS sxy
       |  FROM events GROUP BY 1)
       |SELECT event_type, CAST(n AS BIGINT) AS n_events,
       |  round_even(sx / n, 4) AS mean_value,
       |  round_even(sqrt((sxx - sx * sx / n) / (n - 1)), 4) AS stddev_value,
       |  round_even(((sxy - sx * sy / n) / (n - 1))
       |    / (sqrt((sxx - sx * sx / n) / (n - 1)) * sqrt((syy - sy * sy / n) / (n - 1))), 4) AS corr_value_k
       |FROM s""".stripMargin
  }

  val valueHistogramSql: String =
    """SELECT event_type,
      |  CAST(floor((value - 0.0) / 50.0) AS BIGINT) AS bucket,
      |  count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  val rankWindowsSql: String =
    """SELECT c_mktsegment, c_custkey, c_acctbal,
      |  CAST(rank() OVER w AS BIGINT) AS bal_rank,
      |  CAST(dense_rank() OVER w AS BIGINT) AS bal_dense_rank,
      |  CAST(ntile(4) OVER w AS BIGINT) AS bal_quartile,
      |  lead(c_custkey, 1) OVER w AS next_custkey
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)""".stripMargin

  val customersWithoutOrdersSql: String =
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin

  /** Same correlated-scalar-subquery text as the Spark query (both dialects
    * accept it); decimal sums keep the avg boundary bit-stable.
    */
  val scalarSubquerySql: String =
    """WITH cust_totals AS (
      |  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(38,6))) AS cust_total_dec
      |  FROM orders GROUP BY o_custkey),
      |enriched AS (
      |  SELECT c.c_custkey, c.c_name, n.n_name,
      |         CAST(ct.cust_total_dec AS DOUBLE) AS cust_total,
      |         CAST((SELECT sum(ct2.cust_total_dec)
      |               FROM cust_totals ct2 JOIN customer c2 ON ct2.o_custkey = c2.c_custkey
      |               WHERE c2.c_nationkey = c.c_nationkey) AS DOUBLE)
      |           / (SELECT count(*)
      |              FROM cust_totals ct3 JOIN customer c3 ON ct3.o_custkey = c3.c_custkey
      |              WHERE c3.c_nationkey = c.c_nationkey) AS nation_avg
      |  FROM customer c
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  JOIN cust_totals ct ON ct.o_custkey = c.c_custkey)
      |SELECT * FROM enriched WHERE cust_total > nation_avg""".stripMargin

  val correlatedInSql: String =
    """SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, o.o_totalprice
      |FROM orders o
      |WHERE o.o_totalprice IN (SELECT max(o2.o_totalprice) FROM orders o2
      |                         WHERE o2.o_custkey = o.o_custkey)""".stripMargin

  val lateralTopOrdersSql: String =
    """SELECT c.c_custkey, c.c_name, t.o_orderkey, t.o_totalprice
      |FROM customer c,
      |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
      |         WHERE o.o_custkey = c.c_custkey
      |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t""".stripMargin

  val unpivotPriorityMetricsSql: String =
    """SELECT o_orderpriority, metric, value FROM (
      |  SELECT o_orderpriority,
      |         CAST(count(*) AS DOUBLE) AS n_orders,
      |         CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price,
      |         CAST(count(DISTINCT o_custkey) AS DOUBLE) AS n_customers
      |  FROM orders GROUP BY o_orderpriority)
      |UNPIVOT (value FOR metric IN (n_orders, total_price, n_customers))""".stripMargin

  val orderStatusPivotSql: String =
    """SELECT date_trunc('month', o_orderdate) AS order_month,
      |  CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_open,
      |  CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_filled,
      |  CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_partial
      |FROM orders GROUP BY 1""".stripMargin

  val rollupStatsSql: String =
    """SELECT coalesce(o_orderpriority, 'ALL') AS priority,
      |  count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price
      |FROM orders GROUP BY ROLLUP(o_orderpriority)""".stripMargin

  val cubeStatsSql: String =
    """SELECT coalesce(o_orderpriority, 'ALL') AS priority,
      |  coalesce(o_orderstatus, 'ALL') AS status,
      |  count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price
      |FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)""".stripMargin

  /** Gap sessionization as portable SQL: Spark's session_window merges an
    * event into the open session iff its gap from the previous event is
    * STRICTLY under the gap duration (window [ts, ts+gap) must overlap),
    * so the new-session predicate here is `>=`. Ties cannot hide a
    * semantic gap: testdata timestamps are ms-random (exact-480-minute
    * gaps do not occur), and same-ts events merge under both rules.
    */
  val userSessionsSql: String =
    """WITH flagged AS (
      |  SELECT user_id, event_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |         OR ts - lag(ts) OVER w >= INTERVAL 480 MINUTE THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS UNBOUNDED PRECEDING) AS session_seq
      |  FROM flagged)
      |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
      |FROM sess GROUP BY user_id, session_seq""".stripMargin

  val trainSplitSql: String =
    """SELECT lang,
      |  CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'cc' THEN 'train'
      |       WHEN md5(CAST(doc_id AS VARCHAR)) < 'e6' THEN 'val'
      |       ELSE 'test' END AS split,
      |  count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents GROUP BY 1, 2""".stripMargin

  val packBinsSql: String =
    s"""WITH t AS (
       |  SELECT lang, doc_id,
       |    CAST(len(regexp_extract_all(text, '${TextOps.tokenPattern}')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |c AS (
       |  SELECT *, sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
       |    ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM t)
       |SELECT lang, CAST((cum - n_tokens) // 4096 AS BIGINT) AS bin,
       |  count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
       |FROM c GROUP BY 1, 2""".stripMargin

  /** Mirrors Corpus.decontaminate (k=8): DuckDB's inclusive 1-based list
    * slice w[i:i+7] over range(1, len(w)-6) is the 8-token shingle; short
    * docs yield an empty comprehension, matching the Spark guard.
    */
  val decontaminateSql: String =
    s"""WITH s AS (
       |  SELECT doc_id,
       |    CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'cc' THEN 'train'
       |         WHEN md5(CAST(doc_id AS VARCHAR)) < 'e6' THEN 'val'
       |         ELSE 'test' END AS split,
       |    list_distinct([array_to_string(w[i:i+7], ' ') for i in range(1, len(w) - 6)]) AS sh
       |  FROM (SELECT doc_id, $W AS w FROM documents)),
       |e AS (SELECT doc_id, split, unnest(sh) AS shingle FROM s),
       |held AS (SELECT DISTINCT shingle FROM e WHERE split <> 'train')
       |SELECT e.doc_id, count(*) AS n_contaminated_shingles
       |FROM e JOIN held USING (shingle)
       |WHERE e.split = 'train'
       |GROUP BY 1""".stripMargin

  /** Corpus.contaminationScores: per-train-doc held-out shingle overlap
    * fraction + the >= 0.2 flag. Same split rule and shingle CTEs as
    * [[decontaminateSql]]; the fraction is one integer/integer double
    * division (bit-stable cross-engine).
    */
  val contaminationScoresSql: String =
    s"""WITH s AS (
       |  SELECT doc_id,
       |    CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'cc' THEN 'train'
       |         WHEN md5(CAST(doc_id AS VARCHAR)) < 'e6' THEN 'val'
       |         ELSE 'test' END AS split,
       |    list_distinct([array_to_string(w[i:i+7], ' ') for i in range(1, len(w) - 6)]) AS sh
       |  FROM (SELECT doc_id, $W AS w FROM documents)),
       |e AS (SELECT doc_id, split, unnest(sh) AS shingle FROM s),
       |held AS (SELECT DISTINCT shingle FROM e WHERE split <> 'train'),
       |m AS (
       |  SELECT e.doc_id, count(*) AS n_contaminated
       |  FROM e JOIN held USING (shingle)
       |  WHERE e.split = 'train' GROUP BY 1)
       |SELECT s.doc_id,
       |  CAST(len(s.sh) AS BIGINT) AS n_shingles,
       |  coalesce(m.n_contaminated, 0) AS n_contaminated,
       |  CASE WHEN len(s.sh) > 0
       |       THEN CAST(coalesce(m.n_contaminated, 0) AS DOUBLE) / len(s.sh)
       |  END AS contamination,
       |  coalesce(CAST(coalesce(m.n_contaminated, 0) AS DOUBLE) / nullif(len(s.sh), 0) >= 0.2,
       |           FALSE) AS flagged
       |FROM s LEFT JOIN m USING (doc_id)
       |WHERE s.split = 'train'""".stripMargin

  /** Sampling.trainingOrder: dense 0-based rank in seeded-hash order. The
    * oracle's window form is the semantic contract; the Spark side computes
    * the same total order scalably (range partition + offset stamping).
    */
  val trainingOrderSql: String =
    """SELECT doc_id,
      |  CAST(row_number() OVER (
      |    ORDER BY md5('graft:' || CAST(doc_id AS VARCHAR)), doc_id) - 1
      |    AS BIGINT) AS train_rank
      |FROM documents""".stripMargin

  /** Sampling.shardStats: round-robin shards over the training order. */
  val shardStatsSql: String =
    """WITH r AS (
      |  SELECT doc_id, n_chars,
      |    row_number() OVER (
      |      ORDER BY md5('graft:' || CAST(doc_id AS VARCHAR)), doc_id) - 1 AS rk
      |  FROM documents)
      |SELECT rk % 8 AS shard, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM r GROUP BY 1""".stripMargin

  /** Mirrors Sampling.mixtureWeights (α fixed at 0.5 → sqrt, correctly
    * rounded on both engines; denominator = Σ floor(sqrt(share)·1e9) as
    * exact BIGINTs — the fixed-point contract).
    */
  val mixtureWeightsSql: String =
    s"""WITH s AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(len($W)) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY 1),
       |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tt FROM s),
       |q AS (
       |  SELECT s.*, tt,
       |    CAST(floor(sqrt(CAST(n_tokens AS DOUBLE) / tt) * 1.0e9) AS BIGINT) AS q
       |  FROM s CROSS JOIN t)
       |SELECT source, n_docs, n_tokens,
       |  round_even(CAST(n_tokens AS DOUBLE) / tt, 4) AS token_share,
       |  round_even(CAST(q AS DOUBLE)
       |    / CAST(sum(q) OVER () AS BIGINT), 4) AS mix_weight
       |FROM q""".stripMargin

  val variantPropsSql: String =
    """SELECT event_type,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS k_bucket,
      |  count(*) AS n,
      |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
      |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
      |FROM events GROUP BY 1, 2""".stripMargin

  val trailingWindowSql: String =
    """SELECT event_type, event_id, ts,
      |  count(*) OVER w AS trailing_n,
      |  CAST(sum(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS trailing_value
      |FROM events
      |WINDOW w AS (PARTITION BY event_type ORDER BY ts
      |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)""".stripMargin

  // ---- dedup ----

  val tfidfTopTermsSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest($W) AS term FROM documents),
       |tf AS (
       |  SELECT doc_id, term, count(*) AS cnt,
       |    sum(count(*)) OVER (PARTITION BY doc_id) AS doc_len
       |  FROM toks GROUP BY doc_id, term),
       |df AS (
       |  SELECT term, count(*) AS n_docs_with
       |  FROM (SELECT DISTINCT doc_id, term FROM toks) GROUP BY term),
       |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_total FROM documents),
       |scored AS (
       |  SELECT doc_id, term,
       |    round_even((CAST(cnt AS DOUBLE) / doc_len)
       |      * ln(n_total / n_docs_with), 4) AS score
       |  FROM tf JOIN df USING (term) CROSS JOIN n),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY doc_id
       |                               ORDER BY score DESC, term) AS term_rank
       |  FROM scored)
       |SELECT doc_id, CAST(term_rank AS BIGINT) AS term_rank, term, score
       |FROM ranked WHERE term_rank <= 3""".stripMargin

  /** Mirrors TextOps.bm25TopDocs (k1=1.2, b=0.75, k=5): the (k1+1) and
    * (1−b) factors are written as the same ARITHMETIC as the Spark side
    * (not pre-evaluated decimals — 1.2+1.0 rounds differently than the
    * literal "2.2" parses). All counts are integer-valued doubles (exact),
    * each query has two terms (IEEE addition is commutative), and the rank
    * orders by the rounded score — so the compare is bit-exact.
    */
  val bm25TopDocsSql: String = {
    val qvals = graft.operators.TextOps.Bm25Queries
      .flatMap { case (q, ts) => ts.map(t => s"($q, '$t')") }.mkString(", ")
    val terms = graft.operators.TextOps.Bm25Queries
      .flatMap(_._2).distinct.map(t => s"'$t'").mkString(", ")
    s"""WITH lens AS (
       |  SELECT doc_id, CAST(len($W) AS DOUBLE) AS dl FROM documents),
       |stats AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n_total,
       |         sum(dl) / count(*) AS avgdl FROM lens),
       |q(query_id, term) AS (VALUES $qvals),
       |tf AS (
       |  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
       |  FROM (SELECT doc_id, unnest($W) AS term FROM documents)
       |  WHERE term IN ($terms) GROUP BY 1, 2),
       |dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
       |scored AS (
       |  SELECT q.query_id, t.doc_id,
       |    round_even(sum(
       |      ln(1.0 + (n_total - df + 0.5) / (df + 0.5))
       |      * (tf * (1.2 + 1.0)
       |         / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)))), 4) AS score
       |  FROM tf t
       |  JOIN dfreq USING (term)
       |  JOIN lens USING (doc_id)
       |  CROSS JOIN stats
       |  JOIN q ON q.term = t.term
       |  GROUP BY 1, 2),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY score DESC, doc_id) AS rank
       |  FROM scored)
       |SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
       |  doc_id, score
       |FROM r WHERE rank <= 5""".stripMargin
  }

  val exactDedupSql: String =
    """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_dups
      |FROM documents GROUP BY 1""".stripMargin

  private val distinctShinglesCte: String =
    s"""dsh AS (
       |  SELECT doc_id, list_distinct(s) AS s FROM shingled)""".stripMargin

  private def sigExpr(j: Int) = s"list_min([md5('$j:' || x) for x in s])"

  private val sigsCte: String = {
    val sigs = (0 until Dedup.NumHashes)
      .map(j => s"${sigExpr(j)} AS sig_$j").mkString(",\n    ")
    s"""sigs AS (
       |  SELECT doc_id,
       |    $sigs
       |  FROM dsh)""".stripMargin
  }

  private def bandExpr(b: Int, rows: Int = Dedup.NumHashes / Dedup.NumBands): String = {
    val parts = (b * rows until (b + 1) * rows).map(j => s"sig_$j")
    "md5(" + parts.mkString(" || '|' || ") + ")"
  }

  /** Banded candidate pairs over the sigs CTE: `nBands` bands of `rows`
    * signatures, bucket-capped like Dedup.bandedCandidates (QUALIFY mirrors
    * capBuckets — buckets larger than MaxBucketSize drop before pairing).
    */
  private def bandedPairsCtes(rows: Int): String = {
    val nBands = Dedup.NumHashes / rows
    val bandRows = (0 until nBands)
      .map(b => s"SELECT doc_id, $b AS band_id, ${bandExpr(b, rows)} AS band_hash FROM sigs")
      .mkString("\n  UNION ALL\n  ")
    s"""bands AS (
       |  $bandRows),
       |capped AS (
       |  SELECT * FROM bands WHERE band_hash IS NOT NULL
       |  QUALIFY count(*) OVER (PARTITION BY band_id, band_hash) <= ${Dedup.MaxBucketSize}),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM capped a JOIN capped b
       |    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
       |       AND a.doc_id < b.doc_id)""".stripMargin
  }

  val minhashSignaturesSql: String = {
    val bands = (0 until Dedup.NumBands)
      .map(b => s"${bandExpr(b)} AS band_$b").mkString(",\n  ")
    s"""WITH $shinglesCte,
       |$distinctShinglesCte,
       |$sigsCte
       |SELECT *,
       |  $bands
       |FROM sigs""".stripMargin
  }

  private val jaccardVerify: String =
    """SELECT p.doc_a, p.doc_b,
      |  CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS n_common,
      |  CAST(len(list_distinct(a.s || b.s)) AS BIGINT) AS n_union,
      |  CASE WHEN len(list_distinct(a.s || b.s)) > 0
      |       THEN CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      |            / len(list_distinct(a.s || b.s)) END AS jaccard
      |FROM pairs p
      |JOIN dsh a ON p.doc_a = a.doc_id
      |JOIN dsh b ON p.doc_b = b.doc_id""".stripMargin

  val minhashLshPairsSql: String =
    s"""WITH $shinglesCte,
       |$distinctShinglesCte,
       |$sigsCte,
       |${bandedPairsCtes(Dedup.NumHashes / Dedup.NumBands)}
       |SELECT * FROM ($jaccardVerify) WHERE n_union > 0 AND jaccard >= 0.5""".stripMargin

  /** Incremental batch-vs-corpus near-dups (Dedup.incrementalNearDups):
    * batch = doc_id % 10 = 7, corpus = the rest. Same bands/sigs CTEs as the
    * self-join family; the asymmetric join caps the CORPUS bucket (QUALIFY
    * over corpus bands mirrors capBuckets — exact, since the Spark side's
    * semi-join prune keeps whole buckets); best corpus match per new doc.
    */
  val incrementalNearDupsSql: String = {
    val rows = Dedup.NumHashes / Dedup.NumBands
    val bandRows = (0 until Dedup.NumBands)
      .map(b => s"SELECT doc_id, $b AS band_id, ${bandExpr(b, rows)} AS band_hash FROM sigs")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH $shinglesCte,
       |$distinctShinglesCte,
       |$sigsCte,
       |bands AS (
       |  $bandRows),
       |nb AS (
       |  SELECT * FROM bands WHERE band_hash IS NOT NULL AND doc_id % 10 = 7),
       |cb AS (
       |  SELECT * FROM bands WHERE band_hash IS NOT NULL AND doc_id % 10 <> 7
       |  QUALIFY count(*) OVER (PARTITION BY band_id, band_hash) <= ${Dedup.MaxBucketSize}),
       |cands AS (
       |  SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS dup_of
       |  FROM nb n JOIN cb c ON n.band_id = c.band_id AND n.band_hash = c.band_hash),
       |verified AS (
       |  SELECT p.new_id, p.dup_of,
       |    CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS n_common,
       |    CAST(len(list_distinct(a.s || b.s)) AS BIGINT) AS n_union,
       |    CASE WHEN len(list_distinct(a.s || b.s)) > 0
       |         THEN CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |              / len(list_distinct(a.s || b.s)) END AS jaccard
       |  FROM cands p
       |  JOIN dsh a ON p.new_id = a.doc_id
       |  JOIN dsh b ON p.dup_of = b.doc_id)
       |SELECT new_id, dup_of, n_common, n_union, jaccard
       |FROM verified WHERE n_union > 0 AND jaccard >= 0.5
       |QUALIFY row_number() OVER (PARTITION BY new_id
       |                           ORDER BY jaccard DESC, dup_of) = 1""".stripMargin
  }

  /** Pre-unrolled connected-components rounds over a symmetric edge CTE
    * `sym(a, b)`: min-label propagation PLUS pointer jumping
    * (lbl ← min(own, neighbors' lbl, lbl-of-lbl)) per round, so the known
    * minimum travels exponentially — `rounds` = 8 covers components whose
    * min-label distance exceeds 2^8 hops, far beyond any LSH near-dup
    * cluster. Replaces the recursive-CTE transitive closure
    * (`reach(src,dst)` = ALL-PAIRS reachability — O(n·m) rows; measured
    * ~15 min per wave at sf0.01, which blew the driver's round-7
    * correctness budget), with the same fixpoint the Spark min-label loop
    * converges to. Each round is three small joins over the edge/label
    * tables — label rows never exceed node count, so cost is bounded by
    * construction, the [[bpeCtes]] unrolling precedent. A (theoretical)
    * unconverged component surfaces as a Spark-vs-oracle mismatch — loud,
    * never a silent pass.
    */
  private def ccLabelCtes(sym: String, pfx: String, rounds: Int = 8): String = {
    // MATERIALIZED is load-bearing (the bpeCtes precedent): each round
    // references its predecessor three times and `sym` once, so an inlined
    // chain re-expands the whole upstream tree 3^rounds times — observed as
    // file-handle exhaustion on the parquet scan before any row flowed.
    val sb = new StringBuilder
    sb ++= s"""${pfx}sym AS MATERIALIZED (SELECT a, b FROM $sym),
       |${pfx}lab_0 AS MATERIALIZED (
       |  SELECT a AS node, least(a, min(b)) AS lbl FROM ${pfx}sym GROUP BY a)""".stripMargin
    for (k <- 1 to rounds) {
      val p = s"${pfx}lab_${k - 1}"
      sb ++= s""",
         |${pfx}lab_$k AS MATERIALIZED (
         |  SELECT node, min(lbl) AS lbl FROM (
         |    SELECT node, lbl FROM $p
         |    UNION ALL
         |    SELECT s.a AS node, l.lbl FROM ${pfx}sym s JOIN $p l ON l.node = s.b
         |    UNION ALL
         |    SELECT l1.node, l2.lbl FROM $p l1 JOIN $p l2 ON l1.lbl = l2.node
         |  ) GROUP BY node)""".stripMargin
    }
    sb.result()
  }

  private val CcRounds = 8

  /** Sequential dedup ingest (Dedup.sequentialIngest, 3 waves split by
    * doc_id % 3): per wave, drop docs with a verified near-dup (jaccard ≥
    * 0.5) in the accumulated store, then within-wave connected components
    * keep each component's minimum doc_id. The per-wave CTE blocks are
    * generated by the same loop the Spark fold runs; each wave's CC is the
    * bounded [[ccLabelCtes]] chain over that wave's survivors.
    */
  val ingestDedupSql: String = {
    val n = 3
    val cap = Dedup.MaxBucketSize
    val rows = Dedup.NumHashes / Dedup.NumBands
    val bandRows = (0 until Dedup.NumBands)
      .map(b => s"SELECT doc_id, $b AS band_id, ${bandExpr(b, rows)} AS band_hash FROM sigs")
      .mkString("\n  UNION ALL\n  ")
    val jacc = s"""CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |        / len(list_distinct(a.s || b.s))""".stripMargin
    def block(i: Int): String = {
      val rem =
        if (i == 0)
          s"""rem_$i AS (
             |  SELECT doc_id FROM sigs WHERE doc_id % $n = $i)"""
        else
          s"""storeb_$i AS (
             |  SELECT b.doc_id, b.band_id, b.band_hash
             |  FROM allbands b JOIN store_${i - 1} s USING (doc_id)
             |  QUALIFY count(*) OVER (PARTITION BY band_id, band_hash) <= $cap),
             |dup_$i AS (
             |  SELECT DISTINCT p.new_id AS doc_id FROM (
             |    SELECT DISTINCT nb.doc_id AS new_id, c.doc_id AS dup_of
             |    FROM allbands nb JOIN storeb_$i c
             |      ON nb.band_id = c.band_id AND nb.band_hash = c.band_hash
             |    WHERE nb.doc_id % $n = $i) p
             |  JOIN dsh a ON p.new_id = a.doc_id
             |  JOIN dsh b ON p.dup_of = b.doc_id
             |  WHERE len(list_distinct(a.s || b.s)) > 0
             |    AND $jacc >= 0.5),
             |rem_$i AS (
             |  SELECT doc_id FROM sigs WHERE doc_id % $n = $i
             |    AND doc_id NOT IN (SELECT doc_id FROM dup_$i))"""
      s"""$rem,
         |remb_$i AS (
         |  SELECT b.doc_id, b.band_id, b.band_hash
         |  FROM allbands b JOIN rem_$i r USING (doc_id)
         |  QUALIFY count(*) OVER (PARTITION BY band_id, band_hash) <= $cap),
         |wv_$i AS MATERIALIZED (
         |  SELECT p.doc_a, p.doc_b FROM (
         |    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |    FROM remb_$i a JOIN remb_$i b
         |      ON a.band_id = b.band_id AND a.band_hash = b.band_hash
         |         AND a.doc_id < b.doc_id) p
         |  JOIN dsh a ON p.doc_a = a.doc_id
         |  JOIN dsh b ON p.doc_b = b.doc_id
         |  WHERE len(list_distinct(a.s || b.s)) > 0
         |    AND $jacc >= 0.5),
         |sym_$i AS (
         |  SELECT doc_a AS a, doc_b AS b FROM wv_$i
         |  UNION SELECT doc_b AS a, doc_a AS b FROM wv_$i),
         |${ccLabelCtes(s"sym_$i", s"w${i}_", CcRounds)},
         |noncanon_$i AS (
         |  SELECT node AS doc_id FROM w${i}_lab_$CcRounds WHERE lbl <> node),
         |keep_$i AS (
         |  SELECT doc_id FROM rem_$i
         |  WHERE doc_id NOT IN (SELECT doc_id FROM noncanon_$i)),
         |store_$i AS (${
        if (i == 0) "SELECT doc_id FROM keep_0"
        else s"SELECT doc_id FROM store_${i - 1} UNION ALL SELECT doc_id FROM keep_$i"})"""
    }
    val finalSel = (0 until n)
      .map(i => s"SELECT doc_id, CAST($i AS BIGINT) AS batch_id FROM keep_$i")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH $shinglesCte,
       |$distinctShinglesCte,
       |$sigsCte,
       |allbands AS (
       |  SELECT * FROM (
       |  $bandRows) t WHERE band_hash IS NOT NULL),
       |${(0 until n).map(block).mkString(",\n")}
       |$finalSel""".stripMargin
  }

  /** Connected components over the LSH pair graph via the bounded
    * [[ccLabelCtes]] chain: component(node) = min over transitively
    * reachable nodes — same fixpoint the Spark min-label propagation
    * converges to.
    */
  val dedupGroupsSql: String =
    s"""WITH pairgraph AS MATERIALIZED (
       |  SELECT doc_a, doc_b FROM ($minhashLshPairsSql)),
       |sym AS (
       |  SELECT doc_a AS a, doc_b AS b FROM pairgraph
       |  UNION SELECT doc_b AS a, doc_a AS b FROM pairgraph),
       |${ccLabelCtes("sym", "g_", CcRounds)}
       |SELECT node, lbl AS component FROM g_lab_$CcRounds""".stripMargin

  /** Corpus.dedupRates: per-(lang, source) exact/near-dup removal counts
    * and survival rate. The near-dup chain is [[dedupGroupsSql]]
    * re-pointed at the exact-dedup keepers (same single-substitution
    * retarget as [[corpusCleanSql]]).
    */
  val dedupRatesSql: String = {
    val groupsOverKept = dedupGroupsSql.replace("FROM documents", "FROM kept")
    s"""WITH exact_keep AS (
       |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
       |kept AS (SELECT d.* FROM documents d JOIN exact_keep k USING (doc_id)),
       |cc AS ($groupsOverKept),
       |nr AS (SELECT node AS doc_id FROM cc WHERE node <> component),
       |t AS (SELECT lang, source, count(*) AS n_docs FROM documents GROUP BY 1, 2),
       |ke AS (SELECT lang, source, count(*) AS n_exact_kept FROM kept GROUP BY 1, 2),
       |ng AS (SELECT lang, source, count(*) AS n_near_removed
       |       FROM kept JOIN nr USING (doc_id) GROUP BY 1, 2)
       |SELECT t.lang, t.source, t.n_docs,
       |  t.n_docs - coalesce(ke.n_exact_kept, 0) AS n_exact_removed,
       |  coalesce(ng.n_near_removed, 0) AS n_near_removed,
       |  round_even(CAST(coalesce(ke.n_exact_kept, 0) - coalesce(ng.n_near_removed, 0)
       |    AS DOUBLE) / t.n_docs, 4) AS survival_rate
       |FROM t
       |LEFT JOIN ke USING (lang, source)
       |LEFT JOIN ng USING (lang, source)""".stripMargin
  }

  /** Composed corpus-preparation pipeline (quality gate → exact dedup →
    * near-dup groups → stats), mirroring `Corpus.cleanCorpusStats` stage
    * for stage. The dedup-group chain is [[dedupGroupsSql]] re-pointed at
    * the filtered doc set: the only `FROM documents` inside it is the
    * shingle CTE's, so a single textual substitution retargets the whole
    * chain (kept in one place — revisit if shinglesCte gains sources).
    */
  val corpusCleanSql: String = {
    val groupsOverDocs2 = dedupGroupsSql.replace("FROM documents", "FROM docs2")
    s"""WITH quality AS ($textQualitySql),
       |docs_clean AS (
       |  SELECT d.* FROM documents d JOIN quality q ON d.doc_id = q.doc_id
       |  WHERE q.quality_score >= 0.70),
       |exact_keep AS (
       |  SELECT min(doc_id) AS doc_id FROM docs_clean GROUP BY md5(text)),
       |docs2 AS (
       |  SELECT d.* FROM docs_clean d JOIN exact_keep k USING (doc_id)),
       |groups AS (SELECT * FROM ($groupsOverDocs2) g),
       |survivors AS (
       |  SELECT d.* FROM docs2 d LEFT JOIN groups g ON d.doc_id = g.node
       |  WHERE g.node IS NULL OR g.component = d.doc_id)
       |SELECT lang, source, count(*) AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS total_chars
       |FROM survivors GROUP BY 1, 2""".stripMargin
  }

  /** Candidates from the SAME 16 MinHash sigs re-banded 8×2 (s-curve
    * midpoint ≈ 0.35 for the 0.3 verification threshold) — mirrors
    * Dedup.ngramJaccardPairs' scale-safe generator.
    */
  val ngramJaccardPairsSql: String =
    s"""WITH $shinglesCte,
       |$distinctShinglesCte,
       |$sigsCte,
       |${bandedPairsCtes(2)}
       |SELECT * FROM ($jaccardVerify) WHERE n_union > 0 AND jaccard >= 0.3""".stripMargin

  val simhashSql: String = {
    val sums = (0 until 64).map { b =>
      val p = b / 4
      val j = 3 - b % 4
      val d = s"CAST(strpos('0123456789abcdef', substr(h, ${p + 1}, 1)) - 1 AS INT)"
      s"sum(CASE WHEN ($d >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS s_$b"
    }.mkString(",\n    ")
    val bits = (0 until 64)
      .map(b => s"(CASE WHEN s_$b > 0 THEN '1' ELSE '0' END)")
      .mkString(" || ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(list_distinct($W)) AS tok FROM documents),
       |hashed AS (SELECT doc_id, md5(tok) AS h FROM toks),
       |bitsums AS (
       |  SELECT doc_id,
       |    $sums
       |  FROM hashed GROUP BY doc_id)
       |SELECT doc_id, $bits AS simhash_bits FROM bitsums""".stripMargin
  }

  /** Mirrors Dedup.simhashPairs: signature packed into two BIGINT halves
    * (left-to-right ×2 fold of the bit string), pigeonhole block candidates
    * (Dedup.SimhashBlocks), Hamming = bit_count(xor) on both halves.
    */
  val simhashPairsSql: String = {
    def half(lo: Int, hi: Int) =
      s"list_reduce([CAST(substr(simhash_bits, i, 1) AS BIGINT) for i in range($lo, $hi)], (x, y) -> x*2 + y)"
    val blocks = Dedup.SimhashBlocks.zipWithIndex.map { case ((start, len), k) =>
      s"SELECT doc_id, hi, lo, $k AS block_id, substr(simhash_bits, $start, $len) AS block_val FROM sg"
    }.mkString("\n  UNION ALL\n  ")
    val hamming = "bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo))"
    s"""WITH sh AS ($simhashSql),
       |sg AS (
       |  SELECT doc_id, simhash_bits,
       |    ${half(1, 33)} AS hi,
       |    ${half(33, 65)} AS lo
       |  FROM sh),
       |blocks AS (
       |  $blocks)
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST($hamming AS BIGINT) AS hamming
       |FROM blocks a JOIN blocks b
       |  ON a.block_id = b.block_id AND a.block_val = b.block_val
       |     AND a.doc_id < b.doc_id
       |WHERE $hamming <= 8""".stripMargin
  }

  // ---- similarity ----

  /** Left-to-right fold matching Spark aggregate(zip_with(a,b,*), 0.0, +). */
  private def dotSql(a: String, b: String): String =
    s"list_reduce([$a[i] * $b[i] for i in range(1, 65)], (x, y) -> x + y)"

  /** Vectors are pre-normalized in the CTE (normalize-then-dot, matching
    * Similarity.vectors), so pairwise cosine is a single dot product.
    */
  private def cosineSql(a: String, b: String): String = dotSql(a, b)

  private val evecCte: String =
    s"""e AS (
       |  SELECT vec_id, [x / n for x in v] AS v FROM (
       |    SELECT vec_id, v, sqrt(${dotSql("v", "v")}) AS n FROM (
       |      SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v
       |      FROM embeddings)))""".stripMargin

  val annBruteForceSql: String =
    s"""WITH $evecCte,
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
       |scored AS (
       |  SELECT query_id, vec_id AS neighbor_id, ${cosineSql("qv", "v")} AS cosine
       |  FROM e CROSS JOIN q WHERE vec_id != query_id),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, cosine
       |FROM r WHERE rank <= 5""".stripMargin

  /** Unrolled Lloyd iterations mirroring Similarity.trainCentroids: assign
    * = max-cosine with low-id ties (row_number window — result-identical
    * to the Spark struct argmax), update = fixed-point (floor(x·2^20) as
    * BIGINT) dimension sums — exact and summation-order-free on BOTH
    * engines, which is what makes a float k-means oracle possible at all —
    * then mean + unit normalization, empty clusters keeping the previous
    * centroid. Iteration count (3), seed (first 8 vectors) and scale are
    * the operator contract.
    */
  private def kmeansCtes(iters: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""cents_0 AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < 8)"""
    for (t <- 1 to iters) {
      val p = t - 1
      sb ++= s""",
         |a_$t AS (
         |  SELECT vec_id, centroid_id FROM (
         |    SELECT e.vec_id, c.centroid_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |                         ORDER BY ${cosineSql("cv", "v")} DESC, c.centroid_id) AS rn
         |    FROM e CROSS JOIN cents_$p c) WHERE rn = 1),
         |g_$t AS (
         |  SELECT centroid_id, dim,
         |    sum(CAST(floor(x * 1048576.0) AS BIGINT)) AS sx, count(*) AS n
         |  FROM (SELECT a.centroid_id,
         |          unnest(generate_series(1, len(e.v))) AS dim,
         |          unnest(e.v) AS x
         |        FROM e JOIN a_$t a USING (vec_id))
         |  GROUP BY 1, 2),
         |r_$t AS (
         |  SELECT centroid_id,
         |    list((CAST(sx AS DOUBLE) / 1048576.0) / CAST(n AS DOUBLE)
         |         ORDER BY dim) AS mv
         |  FROM g_$t GROUP BY 1),
         |cents_$t AS (
         |  SELECT c.centroid_id,
         |    CASE WHEN r.centroid_id IS NULL THEN c.cv
         |         ELSE [x / sqrt(list_reduce([mv[i] * mv[i] for i in range(1, 65)],
         |                                    (a, b) -> a + b)) for x in mv]
         |    END AS cv
         |  FROM cents_$p c LEFT JOIN r_$t r USING (centroid_id))""".stripMargin
    }
    sb.result()
  }

  private val KIters = graft.operators.Similarity.KmeansIters

  val ivfAssignSql: String =
    s"""WITH $evecCte,
       |${kmeansCtes(KIters)},
       |scored AS (
       |  SELECT vec_id, centroid_id, ${cosineSql("cv", "v")} AS cos_c
       |  FROM e CROSS JOIN cents_$KIters),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |                               ORDER BY cos_c DESC, centroid_id) AS rn
       |  FROM scored)
       |SELECT vec_id, centroid_id, cos_c AS centroid_cosine FROM r WHERE rn = 1""".stripMargin

  val annIvfSql: String =
    s"""WITH $evecCte,
       |${kmeansCtes(KIters)},
       |assign AS (
       |  SELECT vec_id, centroid_id FROM (
       |    SELECT e.vec_id, c.centroid_id,
       |      row_number() OVER (PARTITION BY e.vec_id
       |                         ORDER BY ${cosineSql("cv", "v")} DESC, c.centroid_id) AS rn
       |    FROM e CROSS JOIN cents_$KIters c) WHERE rn = 1),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
       |probe AS (
       |  SELECT query_id, centroid_id FROM (
       |    SELECT q.query_id, c.centroid_id,
       |      row_number() OVER (PARTITION BY q.query_id
       |                         ORDER BY ${cosineSql("cv", "qv")} DESC, c.centroid_id) AS rn
       |    FROM q CROSS JOIN cents_$KIters c) WHERE rn <= 2),
       |scored AS (
       |  SELECT q.query_id, e.vec_id AS neighbor_id, ${cosineSql("qv", "v")} AS cosine
       |  FROM e JOIN assign m USING (vec_id)
       |  JOIN probe p ON m.centroid_id = p.centroid_id
       |  JOIN q ON p.query_id = q.query_id
       |  WHERE e.vec_id != q.query_id),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, cosine
       |FROM r WHERE rank <= 5""".stripMargin

  /** Mirrors Similarity.semDedup (nCentroids=8, threshold=0.35): trained
    * k-means assignment (the shared [[kmeansCtes]] contract), then inside
    * each cluster a vector is dropped when ANY lower-id member's cosine
    * clears the threshold. max over doubles is order-free, so
    * max_lower_cosine compares exact.
    */
  val semDedupSql: String =
    s"""WITH $evecCte,
       |${kmeansCtes(KIters)},
       |assign AS (
       |  SELECT vec_id, centroid_id, v FROM (
       |    SELECT e.vec_id, c.centroid_id, e.v,
       |      row_number() OVER (PARTITION BY e.vec_id
       |                         ORDER BY ${cosineSql("cv", "v")} DESC, c.centroid_id) AS rn
       |    FROM e CROSS JOIN cents_$KIters c) WHERE rn = 1),
       |best AS (
       |  SELECT a.vec_id, max(${cosineSql("a.v", "b.v")}) AS max_lower_cosine
       |  FROM assign a JOIN assign b
       |    ON a.centroid_id = b.centroid_id AND b.vec_id < a.vec_id
       |  GROUP BY 1)
       |SELECT a.vec_id, a.centroid_id, best.max_lower_cosine,
       |  coalesce(best.max_lower_cosine < 0.35, TRUE) AS kept
       |FROM assign a LEFT JOIN best USING (vec_id)""".stripMargin

  val jsonPropsSql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(props::JSON->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
      |  CAST(sum(CAST(props::JSON->>'k' AS BIGINT)) AS DOUBLE) / count(*) AS mean_k
      |FROM events GROUP BY 1""".stripMargin

  /** Literal hyperplane arrays — the same Scala-side constants as
    * Similarity.hyperplanes, round-tripped through Double.toString.
    */
  private def planeLit(w: Seq[Double]): String =
    w.map(_.toString).mkString("[", ", ", "]")

  val lshBucketsSql: String = {
    val bits = graft.operators.Similarity.hyperplanes.map { w =>
      s"(CASE WHEN ${dotSql("v", s"(${planeLit(w)})")} > 0 THEN '1' ELSE '0' END)"
    }.mkString(" || ")
    s"""WITH $evecCte
       |SELECT vec_id, $bits AS bucket FROM e""".stripMargin
  }

  val lshNearDupsSql: String = {
    val bits = graft.operators.Similarity.hyperplanes.map { w =>
      s"(CASE WHEN ${dotSql("v", s"(${planeLit(w)})")} > 0 THEN '1' ELSE '0' END)"
    }.mkString(" || ")
    s"""WITH $evecCte,
       |bk0 AS (SELECT vec_id, v, $bits AS bucket FROM e),
       |bk AS (SELECT * FROM bk0
       |       QUALIFY count(*) OVER (PARTITION BY bucket) <= ${operators.Dedup.MaxBucketSize}),
       |b AS (SELECT bucket, vec_id AS vec_b, v AS vb FROM bk)
       |SELECT a.vec_id AS vec_a, b.vec_b, a.bucket, ${dotSql("a.v", "b.vb")} AS cosine
       |FROM bk a JOIN b ON a.bucket = b.bucket AND a.vec_id < b.vec_b
       |WHERE ${dotSql("a.v", "b.vb")} >= 0.4""".stripMargin
  }

  /** Mirrors Similarity.embeddingNearDupsBanded: 48-plane sign signature,
    * 4 bands × 12 bits, bucket-capped candidates, exact cosine verify.
    */
  val embeddingNearDupsSql: String = {
    val sim = graft.operators.Similarity
    val bits = sim.bandPlanes.map { w =>
      s"(CASE WHEN ${dotSql("v", s"(${planeLit(w)})")} > 0 THEN '1' ELSE '0' END)"
    }.mkString(" || ")
    val bandRows = (0 until sim.NumSimBands)
      .map(b => s"SELECT vec_id, $b AS band_id, substr(sig, ${b * sim.BandBits + 1}, ${sim.BandBits}) AS band_val FROM sg")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH $evecCte,
       |sg AS (SELECT vec_id, $bits AS sig FROM e),
       |bands AS (
       |  $bandRows),
       |capped AS (
       |  SELECT * FROM bands
       |  QUALIFY count(*) OVER (PARTITION BY band_id, band_val) <= ${operators.Dedup.MaxBucketSize}),
       |pairs AS (
       |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM capped a JOIN capped b
       |    ON a.band_id = b.band_id AND a.band_val = b.band_val
       |       AND a.vec_id < b.vec_id)
       |SELECT p.vec_a, p.vec_b, ${dotSql("ea.v", "eb.v")} AS cosine
       |FROM pairs p
       |JOIN e ea ON p.vec_a = ea.vec_id
       |JOIN e eb ON p.vec_b = eb.vec_id
       |WHERE ${dotSql("ea.v", "eb.v")} >= 0.4""".stripMargin
  }

  /** Mirrors Similarity.incrementalEmbeddingNearDups: batch = vec_id % 5
    * = 4 vs the rest, same 48-plane sign bands as the self-join family;
    * the QUALIFY cap over corpus bands equals the Spark side's cap over
    * the semi-join-pruned frame (whole buckets survive the prune); best
    * corpus match per new vector.
    */
  val incrementalEmbeddingNearDupsSql: String = {
    val sim = graft.operators.Similarity
    val bits = sim.bandPlanes.map { w =>
      s"(CASE WHEN ${dotSql("v", s"(${planeLit(w)})")} > 0 THEN '1' ELSE '0' END)"
    }.mkString(" || ")
    val bandRows = (0 until sim.NumSimBands)
      .map(b => s"SELECT vec_id, $b AS band_id, substr(sig, ${b * sim.BandBits + 1}, ${sim.BandBits}) AS band_val FROM sg")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH $evecCte,
       |sg AS (SELECT vec_id, $bits AS sig FROM e),
       |bands AS (
       |  $bandRows),
       |nb AS (SELECT * FROM bands WHERE vec_id % 5 = 4),
       |cb AS (
       |  SELECT * FROM bands WHERE vec_id % 5 <> 4
       |  QUALIFY count(*) OVER (PARTITION BY band_id, band_val) <= ${operators.Dedup.MaxBucketSize}),
       |pairs AS (
       |  SELECT DISTINCT n.vec_id AS new_id, c.vec_id AS dup_of
       |  FROM nb n JOIN cb c
       |    ON n.band_id = c.band_id AND n.band_val = c.band_val),
       |verified AS (
       |  SELECT p.new_id, p.dup_of, ${dotSql("ea.v", "eb.v")} AS cosine
       |  FROM pairs p
       |  JOIN e ea ON p.new_id = ea.vec_id
       |  JOIN e eb ON p.dup_of = eb.vec_id
       |  WHERE ${dotSql("ea.v", "eb.v")} >= 0.4)
       |SELECT new_id, dup_of, cosine FROM verified
       |QUALIFY row_number() OVER (PARTITION BY new_id
       |                           ORDER BY cosine DESC, dup_of) = 1""".stripMargin
  }

  /** Mirrors Multimodal.mediaMetaQuery: the deterministic half of the
    * multimodal pipeline — payload byte length (UTF-8 bytes of text, the
    * synthesized payload), typed metadata, and the metadata resize. The
    * decoded feature vector is oracled separately (mediaFeaturesSql).
    */
  val mediaMetaSql: String =
    """WITH media AS (
      |  SELECT doc_id AS media_id,
      |         CASE WHEN doc_id % 3 = 0 THEN 'image'
      |              WHEN doc_id % 3 = 1 THEN 'audio'
      |              ELSE 'video' END AS kind,
      |         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |         CAST(n_chars % 64 + 32 AS INTEGER) AS width,
      |         CAST(n_chars % 48 + 24 AS INTEGER) AS height,
      |         CAST(CASE WHEN doc_id % 3 = 1 THEN 16000 ELSE 0 END AS INTEGER) AS sample_rate
      |  FROM documents)
      |SELECT media_id, kind, n_bytes, width, height, sample_rate,
      |       CAST(floor(width * least(1.0, 32 / greatest(width, height))) AS INTEGER) AS out_width,
      |       CAST(floor(height * least(1.0, 32 / greatest(width, height))) AS INTEGER) AS out_height
      |FROM media""".stripMargin

  /** Mirrors Multimodal.mediaFeatureQuery INCLUDING the stub decode: the
    * FakeDecoder is deterministic byte arithmetic (acc[i mod 16] +=
    * byte*(1+i mod 7); ((acc mod 1000)-500)/500 as FLOAT), so even the
    * decode seam is oracle-checkable until a real codec replaces it. The
    * documents text is pure ASCII (verified: octet_length = length for
    * every row), so per-character ord() equals the UTF-8 payload byte.
    * REAL/REAL division keeps DuckDB in float32 — bit-identical to the
    * JVM's Float division (verified across all rows at sf0.01).
    */
  val mediaFeaturesSql: String =
    """WITH pos AS (
      |  SELECT doc_id, i, ord(substr(text, CAST(i+1 AS INT), 1)) AS b
      |  FROM documents, unnest(range(0, length(text))) AS u(i)),
      |acc AS (
      |  SELECT doc_id,
      |    coalesce(sum(b*(1+i%7)) FILTER (WHERE i%16=0), 0) AS a0,
      |    coalesce(sum(b*(1+i%7)) FILTER (WHERE i%16=1), 0) AS a1,
      |    coalesce(sum(b*(1+i%7)) FILTER (WHERE i%16=15), 0) AS a15
      |  FROM pos GROUP BY doc_id)
      |SELECT d.doc_id AS media_id,
      |  CASE WHEN d.doc_id % 3 = 0 THEN 'image'
      |       WHEN d.doc_id % 3 = 1 THEN 'audio'
      |       ELSE 'video' END AS kind,
      |  CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes,
      |  CAST((coalesce(a.a0, 0) % 1000) - 500 AS REAL) / CAST(500 AS REAL) AS f0,
      |  CAST((coalesce(a.a1, 0) % 1000) - 500 AS REAL) / CAST(500 AS REAL) AS f1,
      |  CAST((coalesce(a.a15, 0) % 1000) - 500 AS REAL) / CAST(500 AS REAL) AS f_last
      |FROM documents d LEFT JOIN acc a ON d.doc_id = a.doc_id""".stripMargin

  /** Mirrors Multimodal.mediaDecodeQuery ANALYTICALLY: the synthesized PNG
    * of image id has pixel gray g(x, y) = (id·31 + x·7 + y·13) mod 256 at
    * dims (n_chars%64+32, n_chars%48+24), and PNG is lossless, so the
    * decoded raster — and therefore every output column, including the
    * decoded-pixel digest — is a pure function of the documents metadata.
    * The digest input is the hex encoding of the (r, g, b) byte triplets
    * in row-major order (`string_agg … ORDER BY y, x`), matching
    * `Multimodal.contentDigest(pixelBytes(img))`. Luminance bucket of an
    * (g, g, g) pixel is g/16 integer-division (bucket ≤ 15 needs no
    * clamp); REAL/REAL division keeps DuckDB in float32, bit-identical to
    * the JVM's Float division (the mediaFeaturesSql precedent).
    */
  val mediaDecodeSql: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id, n_chars % 64 + 32 AS w, n_chars % 48 + 24 AS h
      |  FROM documents),
      |px AS (
      |  SELECT media_id, w, h, y.y AS y, x.x AS x,
      |         (media_id * 31 + x.x * 7 + y.y * 13) % 256 AS g
      |  FROM m, LATERAL (SELECT unnest(generate_series(0, h - 1)) AS y) y,
      |          LATERAL (SELECT unnest(generate_series(0, w - 1)) AS x) x)
      |SELECT media_id,
      |  CAST(MAX(w) AS INTEGER) AS width, CAST(MAX(h) AS INTEGER) AS height,
      |  CAST(MAX(w) * MAX(h) * 3 AS BIGINT) AS n_bytes,
      |  CAST(SUM(CASE WHEN g // 16 = 0 THEN 1 ELSE 0 END) AS REAL)
      |    / CAST(COUNT(*) AS REAL) AS f0,
      |  CAST(SUM(CASE WHEN g // 16 = 15 THEN 1 ELSE 0 END) AS REAL)
      |    / CAST(COUNT(*) AS REAL) AS f_last,
      |  md5(string_agg(printf('%02x%02x%02x', g, g, g), '' ORDER BY y, x)) AS pix_md5
      |FROM px GROUP BY media_id""".stripMargin

  /** Mirrors Multimodal.audioDecodeQuery ANALYTICALLY: the synthesized WAV
    * of row id holds n = (n_chars%64+32)·16 samples with sample i =
    * ((id·31 + i·7) mod 256 − 128)·256, PCM is lossless, and the decoded
    * header always reads back 16 kHz. Little-endian 16-bit bytes of
    * v·256 are (0x00, v mod 256 two's-complement), so the digest input is
    * '00' + hex(v & 0xff) per sample in order. Amplitude bucket is
    * amp·16/32768 integer-division (≤ 15 since amp ≤ 32767 — the Scala
    * side clamps amp at 32767 first, which only the v = −128 sample hits).
    */
  val audioDecodeSql: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id, (n_chars % 64 + 32) * 16 AS n FROM documents),
      |smp AS (
      |  SELECT media_id, i.i AS i,
      |         (media_id * 31 + i.i * 7) % 256 - 128 AS v
      |  FROM m, LATERAL (SELECT unnest(generate_series(0, n - 1)) AS i) i),
      |s2 AS (
      |  SELECT media_id, i, LEAST(32767, ABS(v * 256)) AS amp,
      |         ABS(v * 256) AS rawamp, (v + 256) % 256 AS b
      |  FROM smp)
      |SELECT media_id,
      |  CAST(16000 AS INTEGER) AS sample_rate,
      |  CAST(COUNT(*) AS BIGINT) AS n_samples,
      |  CAST(COUNT(*) * 2 AS BIGINT) AS n_bytes,
      |  CAST(MAX(rawamp) AS INTEGER) AS peak,
      |  CAST(SUM(CASE WHEN amp * 16 // 32768 = 0 THEN 1 ELSE 0 END) AS REAL)
      |    / CAST(COUNT(*) AS REAL) AS f0,
      |  CAST(SUM(CASE WHEN amp * 16 // 32768 = 15 THEN 1 ELSE 0 END) AS REAL)
      |    / CAST(COUNT(*) AS REAL) AS f_last,
      |  md5(string_agg(printf('00%02x', b), '' ORDER BY i)) AS pcm_md5
      |FROM s2 GROUP BY media_id""".stripMargin

  /** Mirrors Multimodal.videoFramesQuery ANALYTICALLY: each video is 8
    * concatenated 32×24 BMP frames, the stride-4 sampler keeps frame
    * chunks 0 and 4, BMP is lossless, and frame f's pixel gray is
    * (id·31 + x·7 + y·13 + f·17) mod 256 — so the sampled-and-decoded
    * frames are a pure function of (media_id, frame_idx). Constants (dims
    * 32×24, frames {0, 4}) mirror Multimodal.VideoFrameW/H and the
    * query's stride, the same constant-mirroring every oracle here does.
    */
  val videoFramesSql: String =
    """WITH m AS (SELECT doc_id AS media_id FROM documents),
      |fr AS (
      |  SELECT media_id, f.f AS frame_idx
      |  FROM m, LATERAL (SELECT unnest([0, 4]) AS f) f),
      |px AS (
      |  SELECT media_id, frame_idx, y.y AS y, x.x AS x,
      |    (media_id * 31 + x.x * 7 + y.y * 13 + frame_idx * 17) % 256 AS g
      |  FROM fr, LATERAL (SELECT unnest(generate_series(0, 23)) AS y) y,
      |           LATERAL (SELECT unnest(generate_series(0, 31)) AS x) x)
      |SELECT media_id, CAST(frame_idx AS INTEGER) AS frame_idx,
      |  CAST(32 AS INTEGER) AS width, CAST(24 AS INTEGER) AS height,
      |  CAST(32 * 24 * 3 AS BIGINT) AS n_bytes,
      |  CAST(SUM(CASE WHEN g // 16 = 0 THEN 1 ELSE 0 END) AS REAL)
      |    / CAST(COUNT(*) AS REAL) AS f0,
      |  CAST(SUM(CASE WHEN g // 16 = 15 THEN 1 ELSE 0 END) AS REAL)
      |    / CAST(COUNT(*) AS REAL) AS f_last,
      |  md5(string_agg(printf('%02x%02x%02x', g, g, g), '' ORDER BY y, x)) AS pix_md5
      |FROM px GROUP BY media_id, frame_idx""".stripMargin

  /** Mirrors TextOps.repetitionStats: the naive unnest + per-(doc, ngram)
    * count form — the oracle states the semantics the map-side sorted-fold
    * computes. Docs too short for an n-gram fall out of the CTEs and are
    * restored with zeros by the LEFT JOIN, matching Spark's empty-array
    * fold.
    */
  val repetitionStatsSql: String =
    s"""WITH t AS (SELECT doc_id, $W AS w FROM documents),
       |bg AS (SELECT doc_id,
       |  unnest([array_to_string(w[i:i+1], ' ') for i in range(1, len(w))]) AS g
       |  FROM t),
       |bgc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
       |bga AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bigram_count,
       |  CAST(sum(c) AS BIGINT) AS n_bigrams FROM bgc GROUP BY 1),
       |tg AS (SELECT doc_id,
       |  unnest([array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]) AS g
       |  FROM t),
       |tgc AS (SELECT doc_id, g, count(*) AS c FROM tg GROUP BY 1, 2),
       |tga AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_trigrams,
       |  CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_trigram_tokens
       |  FROM tgc GROUP BY 1)
       |SELECT d.doc_id,
       |  COALESCE(n_bigrams, 0) AS n_bigrams,
       |  COALESCE(top_bigram_count, 0) AS top_bigram_count,
       |  COALESCE(n_trigrams, 0) AS n_trigrams,
       |  COALESCE(dup_trigram_tokens, 0) AS dup_trigram_tokens
       |FROM documents d
       |LEFT JOIN bga ON d.doc_id = bga.doc_id
       |LEFT JOIN tga ON d.doc_id = tga.doc_id""".stripMargin

  /** Mirrors Similarity.quantizeEmbeddings: per-dimension min/max over the
    * corpus (parallel unnest zips value with its 1-based subscript), then
    * the same double-precision scale expression — identical IEEE-754
    * operation sequence, so the integer outputs hash-match exactly.
    */
  val quantizeEmbeddingsSql: String =
    """WITH d AS (
      |  SELECT unnest(generate_series(1, len(embedding))) AS dim,
      |         unnest([CAST(x AS DOUBLE) for x in embedding]) AS x
      |  FROM embeddings),
      |g AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM d GROUP BY 1),
      |b AS (SELECT list(mn ORDER BY dim) AS mns, list(mx ORDER BY dim) AS mxs FROM g)
      |SELECT vec_id,
      |  CAST(unnest(generate_series(1, len(embedding))) AS BIGINT) AS dim,
      |  unnest([CASE WHEN mxs[i] = mns[i] THEN CAST(0 AS BIGINT)
      |        ELSE CAST(floor((CAST(embedding[i] AS DOUBLE) - mns[i])
      |               / (mxs[i] - mns[i]) * 255.0) AS BIGINT) END
      |   for i in range(1, len(embedding) + 1)]) AS q
      |FROM embeddings, b""".stripMargin

  /** Mirrors Similarity.annQuantized's INTEGER-scored staged form: quantize
    * to codes q ∈ [0,255] (stored int8 as b = q − 128), stage the bin-center
    * dequantized norm per vector, fold the affine dequantization into
    * per-query weights w_i = qv_i·s_i and correction c0 = Σ qv_i·(mn_i +
    * 128.5·s_i), then score (Σ w_i·(q_i−128) + c0)/‖d‖ — every float
    * expression in the same IEEE-754 operation order as the Spark side
    * (s_i = (mx_i−mn_i)/255.0 computed before each use, exactly like the
    * driver-fitted literal).
    */
  val annQuantizedSql: String = {
    val sI = "((mxs[i] - mns[i]) / 255.0)"
    s"""WITH d AS (
       |  SELECT unnest(generate_series(1, len(embedding))) AS dim,
       |         unnest([CAST(x AS DOUBLE) for x in embedding]) AS x
       |  FROM embeddings),
       |g AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM d GROUP BY 1),
       |b AS (SELECT list(mn ORDER BY dim) AS mns, list(mx ORDER BY dim) AS mxs FROM g),
       |qd AS (SELECT vec_id,
       |  [CASE WHEN mxs[i] = mns[i] THEN CAST(0 AS BIGINT)
       |        ELSE CAST(floor((CAST(embedding[i] AS DOUBLE) - mns[i])
       |               / (mxs[i] - mns[i]) * 255.0) AS BIGINT) END
       |   for i in range(1, len(embedding) + 1)] AS qc
       |  FROM embeddings, b),
       |dv AS (SELECT vec_id, qc,
       |  [mns[i] + (CAST(qc[i] AS DOUBLE) + 0.5) * $sI
       |   for i in range(1, len(qc) + 1)] AS dvec
       |  FROM qd, b),
       |sc AS (SELECT vec_id, qc,
       |  sqrt(list_reduce([dvec[i] * dvec[i] for i in range(1, 65)],
       |                   (x, y) -> x + y)) AS dnorm
       |  FROM dv),
       |$evecCte,
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
       |qw AS (SELECT query_id,
       |  [qv[i] * $sI for i in range(1, 65)] AS w,
       |  list_reduce([qv[i] * (mns[i] + 128.5 * $sI) for i in range(1, 65)],
       |              (x, y) -> x + y) AS c0
       |  FROM q, b),
       |scored AS (
       |  SELECT query_id, vec_id AS neighbor_id,
       |    (list_reduce([w[i] * CAST(qc[i] - 128 AS DOUBLE) for i in range(1, 65)],
       |                 (x, y) -> x + y) + c0) / dnorm AS cosine
       |  FROM sc CROSS JOIN qw WHERE vec_id != query_id),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, cosine
       |FROM r WHERE rank <= 5""".stripMargin
  }

  /** Mirrors TextOps.vocabularyTopK (k=10, ties broken on token). */
  val vocabularyTopKSql: String =
    s"""WITH e AS (SELECT lang, unnest($W) AS token FROM documents),
       |c AS (SELECT lang, token, count(*) AS n_occurrences FROM e GROUP BY 1, 2),
       |r AS (SELECT *, row_number() OVER (
       |  PARTITION BY lang ORDER BY n_occurrences DESC, token) AS rank FROM c)
       |SELECT lang, token, n_occurrences, CAST(rank AS BIGINT) AS rank
       |FROM r WHERE rank <= 10""".stripMargin

  /** Mirrors TextOps.chunkDedup (k=8): DuckDB's inclusive 1-based list slice
    * `w[a:b]` clamps at len(w) exactly like Spark's length-clamped
    * `slice(w, start, 8)`, so the trailing partial chunk agrees.
    */
  val chunkDedupSql: String =
    s"""WITH toks AS (SELECT doc_id, $W AS w FROM documents),
       |chunks AS (
       |  SELECT doc_id, array_to_string(w[(i-1)*8+1:i*8], ' ') AS chunk
       |  FROM toks,
       |    unnest(generate_series(1, CAST(ceil(len(w) / 8.0) AS BIGINT))) AS t(i)),
       |occ AS (
       |  SELECT doc_id, count(*) OVER (PARTITION BY md5(chunk)) AS n FROM chunks)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
       |  CAST(count(*) FILTER (WHERE n > 1) AS BIGINT) AS n_dup_chunks,
       |  round_even(CAST(count(*) FILTER (WHERE n > 1) AS DOUBLE) / count(*), 4)
       |    AS dup_chunk_ratio
       |FROM occ GROUP BY doc_id""".stripMargin

  /** Unrolled BPE merge rounds mirroring Bpe.trainMerges: word table once,
    * then per round (pair counts from the double-space symbol encoding →
    * 1-row argmax with (cnt DESC, l, r) ties → literal replace via scalar
    * subqueries). The same single-pass-per-round replace contract as the
    * Spark side.
    */
  private def bpeCtes(rounds: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""w_0 AS MATERIALIZED (
       |  SELECT ' ' || array_to_string(string_split(w, ''), '  ') || ' ' AS sym,
       |    CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest($W) AS w FROM documents) WHERE w != ''
       |  GROUP BY 1)""".stripMargin
    for (r <- 1 to rounds) {
      val p = r - 1
      sb ++= s""",
         |p_$r AS MATERIALIZED (
         |  SELECT s[i] AS l, s[i+1] AS r, CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM (SELECT string_split(trim(sym), '  ') AS s, freq FROM w_$p),
         |    unnest(generate_series(1, len(s) - 1)) AS t(i)
         |  GROUP BY 1, 2),
         |m_$r AS MATERIALIZED (SELECT l, r, cnt FROM p_$r ORDER BY cnt DESC, l, r LIMIT 1),
         |w_$r AS MATERIALIZED (
         |  SELECT replace(sym,
         |      coalesce(' ' || (SELECT l FROM m_$r) || '  ' || (SELECT r FROM m_$r) || ' ', chr(1)),
         |      coalesce(' ' || (SELECT l || r FROM m_$r) || ' ', chr(1))) AS sym, freq
         |  FROM w_$p)""".stripMargin
    }
    sb.result()
  }

  /** Mirrors Bpe.trainMerges (8 merges). */
  val bpeMergesSql: String = {
    val rounds = graft.operators.Bpe.NumMerges
    val union = (1 to rounds).map(r =>
      s"SELECT CAST($r AS BIGINT) AS merge_rank, l AS lhs, r AS rhs, l || r AS merged, cnt AS pair_count FROM m_$r")
      .mkString("\n|UNION ALL ")
    s"""WITH ${bpeCtes(rounds)}
       |$union""".stripMargin
  }

  /** Mirrors Bpe.applyMerges under the trained merge table: the identical
    * single-pass replace chain replayed in rank order over every token.
    */
  val bpeSegmentSql: String = {
    val rounds = graft.operators.Bpe.NumMerges
    val enc = "' ' || array_to_string(string_split(tok, ''), '  ') || ' '"
    val chain = (1 to rounds).foldLeft(enc) { (c, r) =>
      s"""replace($c,
         |    coalesce(' ' || (SELECT l FROM m_$r) || '  ' || (SELECT r FROM m_$r) || ' ', chr(1)),
         |    coalesce(' ' || (SELECT l || r FROM m_$r) || ' ', chr(1)))""".stripMargin
    }
    s"""WITH ${bpeCtes(rounds)}
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(len(string_split(trim($chain), '  '))) AS BIGINT)
       |    AS n_bpe_tokens
       |FROM (SELECT doc_id, unnest($W) AS tok FROM documents)
       |WHERE tok != ''
       |GROUP BY 1""".stripMargin
  }

  /** Mirrors TextOps.classifierScores: the identical integer weight
    * literals (md5-derived, shared from the operator object), hex bucket
    * parse via DuckDB's 0x-cast, exact long accumulation.
    */
  val classifierScoresSql: String = {
    val wlist = graft.operators.TextOps.ClassifierWeights.mkString("[", ", ", "]")
    s"""WITH tok AS (SELECT doc_id, unnest($W) AS t FROM documents),
       |b AS (SELECT doc_id,
       |    $wlist[CAST(CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT)
       |           % ${graft.operators.TextOps.ClassifierBuckets} + 1 AS INT)] AS w
       |  FROM tok),
       |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |    CAST(sum(w) AS BIGINT) AS raw_score
       |  FROM b GROUP BY 1)
       |SELECT doc_id, n_tokens, raw_score,
       |  round_even(CAST(raw_score AS DOUBLE) / n_tokens, 4) AS score,
       |  raw_score > 0 AS label
       |FROM agg""".stripMargin
  }

  /** Mirrors TextOps.perplexityScores (trainMod=10, trainLt=3,
    * threshold=3.5): add-one bigram LM trained per language on the
    * doc_id%10<3 slice, every doc scored by bigram cross-entropy. The
    * per-doc sum runs over CAST(floor(ln·1e7) AS BIGINT) — order-free
    * exact longs, the Spark side's fixed-point contract — and the BIGINT
    * cast on the sum avoids DuckDB's HUGEINT dtype drift.
    */
  val perplexityScoresSql: String =
    s"""WITH toks AS (SELECT doc_id, lang, $W AS w FROM documents),
       |bg AS (SELECT doc_id, lang, w[i] AS w1, w[i+1] AS w2
       |  FROM toks, unnest(generate_series(1, len(w) - 1)) AS t(i)),
       |cb AS (SELECT lang, w1, w2, count(*) AS cb FROM bg
       |  WHERE doc_id % 10 < 3 GROUP BY 1, 2, 3),
       |cu AS (SELECT lang, w1, CAST(sum(cb) AS BIGINT) AS cu FROM cb GROUP BY 1, 2),
       |v AS (SELECT lang, count(DISTINCT tok) AS v
       |  FROM (SELECT lang, unnest(w) AS tok FROM toks WHERE doc_id % 10 < 3)
       |  GROUP BY 1),
       |ll AS (SELECT doc_id, bg.lang,
       |    CAST(floor(ln((CAST(coalesce(cb, 0) AS DOUBLE) + 1.0)
       |      / (CAST(coalesce(cu, 0) AS DOUBLE) + CAST(v AS DOUBLE))) * 1.0e7)
       |      AS BIGINT) AS q
       |  FROM bg LEFT JOIN cb USING (lang, w1, w2)
       |    LEFT JOIN cu USING (lang, w1) JOIN v USING (lang)),
       |agg AS (SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_bigrams,
       |    CAST(sum(q) AS BIGINT) AS sq
       |  FROM ll GROUP BY 1, 2)
       |SELECT doc_id, lang, n_bigrams,
       |  round_even(-(CAST(sq AS DOUBLE) / 1.0e7) / n_bigrams, 4) AS cross_entropy,
       |  round_even(-(CAST(sq AS DOUBLE) / 1.0e7) / n_bigrams, 4) <= 3.5 AS keep
       |FROM agg""".stripMargin

  /** Mirrors TextOps.scrubBoilerplate (k=8, maxOcc=1): chunks over the
    * occurrence cap drop, survivors re-join in document order; the
    * FILTERed ordered string_agg is the SQL form of the Spark side's
    * null-skipping collect_list + array_sort.
    */
  val scrubBoilerplateSql: String =
    s"""WITH toks AS (SELECT doc_id, $W AS w FROM documents),
       |chunks AS (
       |  SELECT doc_id, i AS idx, array_to_string(w[(i-1)*8+1:i*8], ' ') AS chunk
       |  FROM toks,
       |    unnest(generate_series(1, CAST(ceil(len(w) / 8.0) AS BIGINT))) AS t(i)),
       |occ AS (
       |  SELECT *, count(*) OVER (PARTITION BY md5(chunk)) AS n FROM chunks)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
       |  CAST(count(*) FILTER (WHERE n > 1) AS BIGINT) AS n_removed_chunks,
       |  coalesce(string_agg(chunk, ' ' ORDER BY idx) FILTER (WHERE n <= 1), '')
       |    AS clean_text
       |FROM occ GROUP BY doc_id""".stripMargin

  /** Mirrors Dedup.canonicalDocs: the [[dedupGroupsSql]] component chain +
    * quality argmax (quality DESC, node ASC) per component.
    */
  val canonicalDocsSql: String =
    s"""WITH groups AS (SELECT * FROM ($dedupGroupsSql) gg),
       |q AS ($textQualitySql),
       |ranked AS (
       |  SELECT g.component, g.node, q.quality_score,
       |    row_number() OVER (PARTITION BY g.component
       |                       ORDER BY q.quality_score DESC, g.node) AS rn,
       |    count(*) OVER (PARTITION BY g.component) AS n_members,
       |    max(q.quality_score) OVER (PARTITION BY g.component) AS best_q
       |  FROM groups g JOIN q ON g.node = q.doc_id)
       |SELECT component, node AS canonical_doc,
       |  CAST(n_members AS BIGINT) AS n_members, best_q AS best_quality
       |FROM ranked WHERE rn = 1""".stripMargin

  /** THE composed end-to-end oracle, mirroring `Corpus.corpusPipeline`
    * stage for stage by chaining the per-stage oracle CTEs this file
    * already maintains (the [[corpusCleanSql]] survivor chain, the
    * [[scrubBoilerplateSql]] chunk scrub carrying lang/source, the
    * [[piiScrubSql]] redaction chain, [[perplexityScoresSql]] /
    * [[classifierScoresSql]] / [[contaminationScoresSql]] retargeted at
    * the pipeline's intermediate frames via the same single-substitution
    * convention as [[dedupRatesSql]], then the [[mixtureWeightsSql]]
    * fixed-point budget rule, [[budgetSampleSql]]'s prefix fill,
    * [[trainingOrderSql]]'s seeded rank, and [[packBinsSql]]'s window
    * pack). Defaults match the Spark side: minQuality 0.70, perplexity
    * threshold 3.5, flagAt 0.2, totalBudget 20000, nShards 8, seqBudget
    * 1024, seed 'graft'. Multiply-referenced frames are MATERIALIZED —
    * inlining would re-expand the survivor chain per consumer.
    */
  /** The batch pipeline's stage-1 CTE chain (quality gate → exact dedup →
    * near-dup survivors) — shared by the manifest and funnel oracles.
    */
  private val batchSurvivorCtes: String = {
    val groupsOverDocs2 = dedupGroupsSql.replace("FROM documents", "FROM docs2")
    s"""quality AS ($textQualitySql),
       |docs_clean AS MATERIALIZED (
       |  SELECT d.* FROM documents d JOIN quality q ON d.doc_id = q.doc_id
       |  WHERE q.quality_score >= 0.70),
       |exact_keep AS (
       |  SELECT min(doc_id) AS doc_id FROM docs_clean GROUP BY md5(text)),
       |docs2 AS MATERIALIZED (
       |  SELECT d.* FROM docs_clean d JOIN exact_keep k USING (doc_id)),
       |groups AS (SELECT * FROM ($groupsOverDocs2) g),
       |survivors AS (
       |  SELECT d.* FROM docs2 d LEFT JOIN groups g ON d.doc_id = g.node
       |  WHERE g.node IS NULL OR g.component = d.doc_id)""".stripMargin
  }

  val corpusPipelineSql: String = pipelineTailSql(batchSurvivorCtes)

  /** Mirrors `Corpus.pipelineFunnel`: the per-stage survivor counts of the
    * batch pipeline, one count per CTE boundary of THE SAME chain the
    * manifest oracle runs ([[batchSurvivorCtes]] + [[pipelineTailCtes]]).
    */
  val corpusFunnelSql: String =
    pipelineTailCtes(batchSurvivorCtes) + funnelCountsSql(exactCte = "docs2")

  /** The funnel's closing SELECT — per-stage counts over the shared CTE
    * chain. Only the exact-dedup CTE name differs between the batch
    * (`docs2`, min-id rule) and incremental (`docs_exact`,
    * first-arrival rule) chains.
    */
  private def funnelCountsSql(exactCte: String): String = s"""
       |SELECT CAST(0 AS BIGINT) AS stage_idx, 'raw' AS stage,
       |  CAST(count(*) AS BIGINT) AS n_docs FROM documents
       |UNION ALL SELECT 1, 'quality_gate', count(*) FROM docs_clean
       |UNION ALL SELECT 2, 'exact_dedup', count(*) FROM $exactCte
       |UNION ALL SELECT 3, 'near_dedup', count(*) FROM survivors
       |UNION ALL SELECT 4, 'boilerplate_scrub', count(*) FROM red
       |UNION ALL SELECT 5, 'model_gates', count(*) FROM gated
       |UNION ALL SELECT 6, 'train_split', count(*) FROM train
       |UNION ALL SELECT 7, 'decontaminated', count(*) FROM toks
       |UNION ALL SELECT 8, 'budget_kept', count(*) FROM kept""".stripMargin

  /** The arrival-order stage-1 CTE chain (mirrors
    * `Corpus.incrementalSurvivorStages`): the quality gate, the exact
    * first-arrival-wins pre-dedup (earliest wave then min doc_id — the
    * Spark side's md5-keyed window; without it two identical shingle-less
    * docs in different waves would both survive the fold), then the
    * [[ingestDedupSql]] greedy arrival-wave fold RETARGETED at the
    * exact-deduped docs (the same single-substitution convention as
    * [[dedupRatesSql]] — the only `FROM documents` inside it is the
    * shingle CTE's). `docs_clean` is MATERIALIZED: the pre-dedup and the
    * survivor join both consume it. Shared by the incremental manifest
    * and funnel oracles.
    */
  private val incrementalSurvivorCtes: String = {
    val ingestOverExact = ingestDedupSql.replace("FROM documents", "FROM docs_exact")
    s"""quality AS ($textQualitySql),
       |docs_clean AS MATERIALIZED (
       |  SELECT d.* FROM documents d JOIN quality q ON d.doc_id = q.doc_id
       |  WHERE q.quality_score >= 0.70),
       |docs_exact AS MATERIALIZED (
       |  SELECT * EXCLUDE (__rn) FROM (
       |    SELECT d.*, row_number() OVER (
       |      PARTITION BY md5(text) ORDER BY doc_id % 3, doc_id) AS __rn
       |    FROM docs_clean d)
       |  WHERE __rn = 1),
       |keepers AS (SELECT doc_id FROM ($ingestOverExact) ing),
       |survivors AS (
       |  SELECT d.* FROM docs_clean d JOIN keepers k USING (doc_id))""".stripMargin
  }

  val corpusPipelineIncrementalSql: String =
    pipelineTailSql(incrementalSurvivorCtes)

  /** Mirrors `q_store_lookup` — the store's kept documents (the
    * arrival-order survivor set, same CTEs as the manifest oracle)
    * restricted to the texts of three fixed probe documents. The Spark
    * side reads the pruned snapshot scan; the oracle recomputes the
    * survivor set — equal because pruning never removes a file that might
    * hold a matching row.
    */
  val storeLookupSql: String =
    s"""WITH $incrementalSurvivorCtes
       |SELECT s.doc_id, s.lang, s.source FROM survivors s
       |WHERE md5(s.text) IN (
       |  SELECT md5(text) FROM documents WHERE doc_id IN (5, 17, 40))""".stripMargin

  /** Mirrors `q_store_mirror` — the CDF consumer's downstream mirror
    * after applying the bootstrap window (version 0 → current): exactly
    * the store's kept-document set, i.e. the arrival-order survivors.
    * The Spark side goes store → `changesBetween(0, cur)` →
    * [[graft.streaming.StoreChangesMirror.applyBatch]] → mirror read; the
    * oracle recomputes the survivor set directly — equal because the
    * bootstrap diff IS every kept doc as an insert and the keyed upsert
    * is the identity on an empty mirror (and idempotent on replays).
    */
  val storeMirrorSql: String =
    s"""WITH $incrementalSurvivorCtes
       |SELECT s.doc_id, s.lang, s.source FROM survivors s""".stripMargin

  /** Mirrors `q_store_forget` — the store's kept documents after purging
    * two probe texts: exactly the survivor set minus any doc whose text
    * matches a probe (the purge removes the keeper rows; near-dup/exact
    * decisions already made are unaffected because the store's dedup
    * state only ever SUPPRESSES later arrivals, and none arrive here).
    */
  val storeForgetSql: String =
    s"""WITH $incrementalSurvivorCtes
       |SELECT s.doc_id, s.lang, s.source FROM survivors s
       |WHERE md5(s.text) NOT IN (
       |  SELECT md5(text) FROM documents WHERE doc_id IN (5, 17))""".stripMargin

  /** Mirrors `q_store_band_lookup` — the docs sharing LSH band 0 with the
    * lowest-doc_id banded survivor ("which documents share this band", the
    * investigative read the optimizer rule index-prunes). The oracle
    * recomputes the survivors' band-0 hash with the SAME md5-over-sigs
    * expression the signature oracle pins byte-identical cross-engine
    * (`q_minhash_signatures` is full-hash green), so the collision group
    * is exact, not merely isomorphic.
    */
  val storeBandLookupSql: String = {
    val rows = Dedup.NumHashes / Dedup.NumBands
    val sigs = (0 until rows).map(j => s"${sigExpr(j)} AS sig_$j")
      .mkString(",\n    ")
    s"""WITH $incrementalSurvivorCtes,
       |${shinglesCteFrom("survivors")},
       |$distinctShinglesCte,
       |sigs AS (
       |  SELECT doc_id,
       |    $sigs
       |  FROM dsh),
       |banded AS (
       |  SELECT doc_id, ${bandExpr(0, rows)} AS band_val FROM sigs),
       |nn AS (SELECT * FROM banded WHERE band_val IS NOT NULL),
       |probe AS (
       |  SELECT band_val FROM nn
       |  WHERE doc_id = (SELECT min(doc_id) FROM nn))
       |SELECT nn.doc_id FROM nn
       |WHERE nn.band_val = (SELECT band_val FROM probe)""".stripMargin
  }

  /** Mirrors `q_store_changes` — the change data feed between the
    * waves-0/1 snapshot and the final snapshot (wave 2 ingested, then the
    * texts of docs 7 and 11 purged). Inserts are the wave-2 survivors of
    * the arrival-order chain minus any purged text (doc 11's text, wave 2,
    * cancels its own insert); deletes are the wave-0/1 survivors whose
    * text was purged (doc 7's text, wave 1, present at the from-version
    * and gone at the to-version). Keeper identity is by text md5 — the
    * store's content key — so a probe text that failed the quality gate or
    * lost exact dedup to an earlier wave yields the same (absent) change
    * row on both sides.
    */
  val storeChangesSql: String =
    s"""WITH $incrementalSurvivorCtes,
       |probe AS (SELECT md5(text) AS k FROM documents WHERE doc_id IN (7, 11))
       |SELECT s.doc_id, s.lang, s.source, md5(s.text) AS text_md5,
       |  'insert' AS change
       |FROM survivors s
       |WHERE s.doc_id % 3 = 2 AND md5(s.text) NOT IN (SELECT k FROM probe)
       |UNION ALL
       |SELECT s.doc_id, s.lang, s.source, md5(s.text) AS text_md5,
       |  'delete' AS change
       |FROM survivors s
       |WHERE s.doc_id % 3 < 2 AND md5(s.text) IN (SELECT k FROM probe)""".stripMargin

  /** Mirrors `Corpus.pipelineFunnelIncremental` — the per-stage counts of
    * the arrival-order chain ([[incrementalSurvivorCtes]] + the shared
    * tail).
    */
  val corpusFunnelIncrementalSql: String =
    pipelineTailCtes(incrementalSurvivorCtes) + funnelCountsSql(exactCte = "docs_exact")

  /** Stage 2–7 oracle tail over a CTE chain ending in `survivors`
    * (doc_id, text, lang, source, …) — shared by the batch, staged, and
    * incremental pipeline oracles.
    */
  private def pipelineTailSql(survivorCtes: String): String =
    pipelineTailCtes(survivorCtes) + s"""
       |SELECT CAST(shard AS BIGINT) AS shard,
       |  CAST((pc - n_tokens) // 1024 AS BIGINT) AS bin,
       |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
       |FROM packed GROUP BY 1, 2""".stripMargin

  /** The tail's full CTE chain (WITH … packed) without a final SELECT —
    * [[pipelineTailSql]] closes it with the manifest aggregate,
    * [[corpusFunnelSql]] with the per-stage counts.
    */
  private def pipelineTailCtes(survivorCtes: String): String = {
    val perpOverRed = perplexityScoresSql.replace("FROM documents", "FROM red")
    val clsfOverRed = classifierScoresSql.replace("FROM documents", "FROM red")
    val contOverGated = contaminationScoresSql.replace("FROM documents", "FROM gated")
    val em = TextOps.emailPattern
    val ip = TextOps.ipv4Pattern
    val ph = TextOps.phonePattern
    s"""WITH $survivorCtes,
       |sc_toks AS (SELECT doc_id, lang, source, $W AS w FROM survivors),
       |sc_chunks AS (
       |  SELECT doc_id, lang, source, i AS idx,
       |    array_to_string(w[(i-1)*8+1:i*8], ' ') AS chunk
       |  FROM sc_toks,
       |    unnest(generate_series(1, CAST(ceil(len(w) / 8.0) AS BIGINT))) AS t(i)),
       |sc_occ AS (
       |  SELECT *, count(*) OVER (PARTITION BY md5(chunk)) AS n FROM sc_chunks),
       |scrubbed AS (
       |  SELECT doc_id, lang, source,
       |    coalesce(string_agg(chunk, ' ' ORDER BY idx) FILTER (WHERE n <= 1), '')
       |      AS clean_text
       |  FROM sc_occ GROUP BY doc_id, lang, source),
       |red AS MATERIALIZED (
       |  SELECT doc_id, lang, source,
       |    regexp_replace(regexp_replace(regexp_replace(clean_text,
       |      '$em', '[EMAIL]', 'g'),
       |      '$ip', '[IP]', 'g'),
       |      '$ph', '[PHONE]', 'g') AS text
       |  FROM scrubbed WHERE length(clean_text) > 0),
       |pk AS (SELECT doc_id FROM ($perpOverRed) pp WHERE keep),
       |ck AS (SELECT doc_id FROM ($clsfOverRed) cc WHERE label),
       |gated AS MATERIALIZED (
       |  SELECT r.* FROM red r JOIN pk USING (doc_id) JOIN ck USING (doc_id)),
       |unflagged AS (SELECT doc_id FROM ($contOverGated) ct WHERE NOT flagged),
       |train AS (
       |  SELECT g.* FROM gated g WHERE md5(CAST(doc_id AS VARCHAR)) < 'cc'),
       |decon AS (SELECT t.* FROM train t JOIN unflagged USING (doc_id)),
       |toks AS MATERIALIZED (
       |  SELECT source, doc_id,
       |    CAST(len(regexp_extract_all(text, '${TextOps.tokenPattern}')) AS BIGINT)
       |      AS n_tokens
       |  FROM decon),
       |ps AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_tokens
       |       FROM toks GROUP BY 1),
       |tt AS (SELECT CAST(sum(src_tokens) AS BIGINT) AS t FROM ps),
       |bq AS (
       |  SELECT source,
       |    CAST(floor(sqrt(CAST(src_tokens AS DOUBLE) / t) * 1.0e9) AS BIGINT) AS q
       |  FROM ps CROSS JOIN tt),
       |bud AS (
       |  SELECT source,
       |    CAST(floor(round_even(CAST(q AS DOUBLE)
       |      / CAST(sum(q) OVER () AS BIGINT), 4) * 20000) AS BIGINT) AS budget
       |  FROM bq),
       |cum AS (
       |  SELECT t.source, t.doc_id, t.n_tokens, budget,
       |    sum(n_tokens) OVER (PARTITION BY t.source
       |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS c
       |  FROM toks t JOIN bud USING (source)),
       |kept AS (SELECT doc_id, n_tokens FROM cum WHERE c - n_tokens < budget),
       |rk AS (
       |  SELECT doc_id, n_tokens,
       |    row_number() OVER (
       |      ORDER BY md5('graft:' || CAST(doc_id AS VARCHAR)), doc_id) - 1
       |      AS train_rank
       |  FROM kept),
       |packed AS (
       |  SELECT train_rank % 8 AS shard, n_tokens,
       |    sum(n_tokens) OVER (PARTITION BY train_rank % 8
       |      ORDER BY train_rank) AS pc
       |  FROM rk)""".stripMargin
  }

  /** Mirrors Sampling.budgetSample (budget=800): hash-ordered running token
    * total per source, keep while the doc's start offset is inside the
    * budget.
    */
  val budgetSampleSql: String =
    s"""WITH t AS (
       |  SELECT source, doc_id,
       |    CAST(len(regexp_extract_all(text, '${TextOps.tokenPattern}')) AS BIGINT)
       |      AS n_tokens
       |  FROM documents),
       |c AS (
       |  SELECT *, sum(n_tokens) OVER (
       |    PARTITION BY source
       |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS cum
       |  FROM t)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs_kept,
       |  CAST(sum(n_tokens) AS BIGINT) AS tokens_kept
       |FROM c WHERE cum - n_tokens < 800 GROUP BY source""".stripMargin

  /** Mirrors TextOps.syntheticPiiDocs + piiScrub: identical pattern text
    * (Java-regex ∩ RE2), counts on the raw text, sequential redaction with
    * the 'g' flag matching Spark's replace-all.
    */
  val piiScrubSql: String = {
    val em = TextOps.emailPattern
    val ip = TextOps.ipv4Pattern
    val ph = TextOps.phonePattern
    s"""WITH raw AS (
       |  SELECT doc_id, text
       |    || CASE WHEN doc_id % 3 = 0
       |         THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
       |         ELSE '' END
       |    || CASE WHEN doc_id % 4 = 0
       |         THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.'
       |           || CAST((doc_id // 7) % 256 AS VARCHAR) || '.1'
       |         ELSE '' END
       |    || CASE WHEN doc_id % 5 = 0
       |         THEN ' call +1555' || lpad(CAST(doc_id % 10000 AS VARCHAR), 7, '0')
       |         ELSE '' END AS raw
       |  FROM documents),
       |red AS (
       |  SELECT doc_id, raw,
       |    regexp_replace(regexp_replace(regexp_replace(raw,
       |      '$em', '[EMAIL]', 'g'),
       |      '$ip', '[IP]', 'g'),
       |      '$ph', '[PHONE]', 'g') AS r3
       |  FROM raw)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(raw, '$em')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(raw, '$ip')) AS BIGINT) AS n_ipv4,
       |  CAST(len(regexp_extract_all(raw, '$ph')) AS BIGINT) AS n_phones,
       |  md5(r3) AS redacted_hash,
       |  CAST(length(r3) AS BIGINT) AS n_chars_redacted
       |FROM red""".stripMargin
  }
}
