package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def emb(vs: (Long, Seq[Float])*) =
    vs.map { case (id, v) => (id, v, 0) }.toDF("vec_id", "embedding", "label")

  test("cosine: identical vectors → 1.0, orthogonal → 0.0") {
    val df = emb(0L -> Seq(1f, 0f), 1L -> Seq(1f, 0f), 2L -> Seq(0f, 1f))
    val c = Similarity.embeddingNearDups(df, threshold = -2.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("cosine")).toMap
    assert(c((0L, 1L)) == 1.0)
    assert(c((0L, 2L)) == 0.0)
  }

  test("annBruteForce ranks by cosine desc with id tiebreak, excludes self") {
    val df = emb(
      0L -> Seq(1f, 0f, 0f),
      1L -> Seq(0.9f, 0.1f, 0f),
      2L -> Seq(0f, 1f, 0f),
      3L -> Seq(1f, 0.01f, 0f))
    val r = Similarity.annBruteForce(df, nQueries = 1, k = 3).collect()
    assert(r.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(3L, 1L, 2L))
    assert(r.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L))
    assert(!r.exists(_.getAs[Long]("neighbor_id") == 0L))
  }

  test("annIvf with probes covering every cell equals brute force; single probe searches own cell") {
    val df = emb(
      0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f), // seeds
      10L -> Seq(0.95f, 0.05f), 11L -> Seq(0.9f, 0.1f), // near seed 0
      20L -> Seq(0.05f, 0.95f)) // near seed 1
    // nProbe=2 over 2 cells = exhaustive → must equal the brute-force answer
    val ivf = Similarity.annIvf(df, nCentroids = 2, k = 2).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"), r.getAs[Long]("neighbor_id")))
    val bf = Similarity.annBruteForce(df, k = 2).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"), r.getAs[Long]("neighbor_id")))
    assert(ivf.toSet == bf.toSet && ivf.length == bf.length)
    // single probe: query 1 searches only its own (trained) cell → {20}
    val one = Similarity.annIvf(df, nCentroids = 2, k = 2, nProbe = 1).collect()
      .groupBy(_.getAs[Long]("query_id"))
    assert(one(1L).map(_.getAs[Long]("neighbor_id")).toSeq == Seq(20L))
  }

  test("ivfAssign sends every vector to its max-cosine trained centroid") {
    val df = emb(0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f), 5L -> Seq(0.2f, 0.8f))
    val a = Similarity.ivfAssign(df, nCentroids = 2).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("centroid_id")).toMap
    // training pulls centroid 1 toward the {1, 5} mean; memberships stay stable
    assert(a(5L) == 1L)
    assert(a(0L) == 0L && a(1L) == 1L)
  }

  test("trained multi-probe IVF recall is at least the untrained single-probe baseline") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    val emb = Tables.embeddings(spark, dir)
    val exact = Similarity.annBruteForce(emb)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      val rs = exact.map { case (q, n) =>
        got.getOrElse(q, Set.empty).intersect(n).size.toDouble / n.size }
      rs.sum / rs.size
    }
    val trained = recall(Similarity.annIvf(emb))
    val baseline = recall(Similarity.annIvf(emb, nProbe = 1, iters = 0))
    assert(trained >= baseline, s"trained=$trained baseline=$baseline")
  }

  test("embeddingNearDupsBanded agrees with the all-pairs baseline on found pairs; cap bounds degenerate buckets") {
    val df = emb(
      0L -> Seq(1f, 0f), 1L -> Seq(1f, 0f), // identical → same sig, cosine 1.0
      2L -> Seq(0f, 1f)) // orthogonal to both
    val banded = Similarity.embeddingNearDupsBanded(df)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("cosine")))
    assert(banded.toSeq == Seq((0L, 1L, 1.0)))
    // every banded pair must appear in the exact all-pairs baseline with the
    // identical cosine (candidates differ, verification must not)
    val exact = Similarity.embeddingNearDups(df)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("cosine"))).toSet
    assert(banded.forall(exact.contains))
    // 15 identical vectors: one bucket per band of size 15 > cap=10 → dropped
    val many = emb((0L until 15L).map(i => i -> Seq(1f, 2f, 3f)): _*)
    assert(Similarity.embeddingNearDupsBanded(many, cap = 10).collect().isEmpty)
    assert(Similarity.embeddingNearDupsBanded(many).count() == 105L)
  }

  test("semDedup: lower-id rule inside clusters, aggressive on chains, cluster min-id kept") {
    // seeds (iters=0 keeps them): c0 = id0 at 0°, c1 = id1 at 270°.
    // id2 at 60° and id3 at 120° both land in cluster 0.
    val df = emb(
      0L -> Seq(1f, 0f),
      1L -> Seq(0f, -1f),
      2L -> Seq(0.5f, 0.8660254f),
      3L -> Seq(-0.5f, 0.8660254f))
    val out = Similarity.semDedup(df, nCentroids = 2, threshold = 0.35, iters = 0)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("centroid_id"), Option(r.get(2)).map(_.asInstanceOf[Double]),
          r.getAs[Boolean]("kept")))).toMap
    // cluster min-ids have no lower-id member → NULL, kept
    assert(out(0L) == ((0L, None, true)))
    assert(out(1L) == ((1L, None, true)))
    // id2: cos vs id0 = 0.5 ≥ τ → dropped
    assert(out(2L)._1 == 0L && !out(2L)._3)
    assert(math.abs(out(2L)._2.get - 0.5) < 1e-6)
    // id3: cos vs id0 = −0.5, vs id2 = 0.5 → dropped even though its only
    // ≥τ lower neighbor (id2) was itself dropped — the one-pass pairwise
    // rule, aggressive on chains by contract
    assert(out(3L)._1 == 0L && !out(3L)._3)
    assert(math.abs(out(3L)._2.get - 0.5) < 1e-6)
  }

  test("CentroidStore: staged consumers byte-identical to self-contained forms") {
    import graft.operators.CentroidStore
    val df = emb(
      0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f),
      2L -> Seq(0.9f, 0.1f), 3L -> Seq(0.1f, 0.9f),
      4L -> Seq(0.8f, 0.3f), 5L -> Seq(0.3f, 0.8f))
    val root = java.nio.file.Files.createTempDirectory("graft_centroids").toString
    CentroidStore.build(df, root, nCentroids = 2)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toSeq).toSet
    assert(rows(CentroidStore.ivfAssign(df, root))
      == rows(Similarity.ivfAssign(df, nCentroids = 2)))
    assert(rows(CentroidStore.semDedup(df, root))
      == rows(Similarity.semDedup(df, nCentroids = 2)))
    assert(rows(CentroidStore.annIvf(df, root, k = 3, nQueries = 2))
      == rows(Similarity.annIvf(df, nCentroids = 2, k = 3, nQueries = 2)))
    spark.catalog.clearCache()
  }

  test("CentroidStore: rebuilds are atomic versions; staging junk is invisible") {
    import graft.operators.CentroidStore
    val df = emb(
      0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f),
      2L -> Seq(0.9f, 0.1f), 3L -> Seq(0.1f, 0.9f))
    val root = java.nio.file.Files.createTempDirectory("graft_centroids_v").toString
    val v1 = CentroidStore.build(df, root, nCentroids = 2)
    assert(v1 == 1L)
    val c1 = CentroidStore.readCentroids(spark, root).map(_.toSeq)
    // a half-written build only ever exists under a _staging_* name; readers
    // must not see it as a model
    new java.io.File(s"$root/_staging_partial").mkdirs()
    assert(CentroidStore.versions(spark, root) == Seq(1L))
    assert(CentroidStore.readCentroids(spark, root).map(_.toSeq) == c1)
    // a rebuild becomes version 2 in one rename; the pinned v1 model stays
    // readable (and byte-identical) until retention drops it
    val v2 = CentroidStore.build(df, root, nCentroids = 1)
    assert(v2 == 2L)
    assert(CentroidStore.readCentroids(spark, root).size == 1)
    assert(CentroidStore.readCentroidsAt(spark, root, 1L).map(_.toSeq) == c1)
    spark.catalog.clearCache()
  }

  test("CentroidStore.refresh: mini-batch Lloyd tick, corpus never re-read") {
    import graft.operators.{CentroidStore, Similarity}
    // two tight clusters around the axes; centroid 0 <- {0,2}, 1 <- {1,3}
    val df = emb(
      0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f),
      2L -> Seq(0.9f, 0.1f), 3L -> Seq(0.1f, 0.9f))
    val root = java.nio.file.Files.createTempDirectory("graft_centroids_r").toString
    val v1 = CentroidStore.build(df, root, nCentroids = 2)
    val m1 = CentroidStore.readCentroids(spark, root).map(_.toSeq)
    val w1 = CentroidStore.readWeightsAt(spark, root, v1)
    assert(w1.sum == 4L, "build weights must count every corpus vector")
    // batch lands entirely in cluster 0's halfspace
    val batch = emb(10L -> Seq(0.95f, 0.05f), 11L -> Seq(0.85f, 0.2f))
    val v2 = CentroidStore.refresh(batch, root)
    assert(v2 == v1 + 1)
    val m2 = CentroidStore.readCentroids(spark, root).map(_.toSeq)
    val w2 = CentroidStore.readWeightsAt(spark, root, v2)
    // expected update mirrored in plain Scala: same normalization, same
    // fixed-point dimension sums, same weighted spherical mix
    val scale = Similarity.KmeansScale.toDouble
    def unit(xs: Seq[Float]): Seq[Double] = {
      val v = xs.map(_.toDouble)
      val n = math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))
      v.map(_ / n)
    }
    val sums = Seq(unit(Seq(0.95f, 0.05f)), unit(Seq(0.85f, 0.2f)))
      .transpose.map(_.map(x => math.floor(x * scale)).sum / scale)
    val mixed = m1.head.indices.map(i => w1.head.toDouble * m1.head(i) + sums(i))
    val nrm = math.sqrt(mixed.foldLeft(0.0)((a, x) => a + x * x))
    assert(m2.head == mixed.map(_ / nrm))
    // the other centroid had no batch members: direction and weight keep
    assert(m2(1) == m1(1) && w2 == Seq(w1.head + 2L, w1(1)))
    // the superseded model stays pinned-readable
    assert(CentroidStore.readCentroidsAt(spark, root, v1).map(_.toSeq) == m1)
    spark.catalog.clearCache()
  }

  test("IvfStore: staged search equals self-contained IVF; only probed cells are read") {
    import graft.operators.IvfStore
    val df = emb(
      0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f),           // seeds -> 2 cells
      2L -> Seq(0.95f, 0.05f), 3L -> Seq(0.9f, 0.2f),
      4L -> Seq(0.1f, 0.95f), 5L -> Seq(0.2f, 0.9f))
    val root = java.nio.file.Files.createTempDirectory("graft_ivfstore").toString
    IvfStore.build(df, root, nCentroids = 2)
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect().map(_.toSeq).toSet
    // full-probe parity: identical output to the self-contained form
    assert(rows(IvfStore.annIvfSelf(spark, root, k = 3, nProbe = 2, nQueries = 2))
      == rows(Similarity.annIvf(df, nCentroids = 2, k = 3, nProbe = 2, nQueries = 2)))
    // single-probe parity AND file pruning: query 0 lives in cell 0, so the
    // scan must plan over cell 0's files only — the inverted-file read
    val staged = IvfStore.annIvfSelf(spark, root, k = 3, nProbe = 1, nQueries = 1)
    assert(rows(staged)
      == rows(Similarity.annIvf(df, nCentroids = 2, k = 3, nProbe = 1, nQueries = 1)))
    val cellDirs = staged.inputFiles.map(_.split("/").find(_.startsWith("p_cell=")).get).toSet
    assert(cellDirs == Set("p_cell=0"), s"read beyond the probed cell: $cellDirs")
    // incremental tick: a new batch is assigned under the staged model and
    // appended; search equals the self-contained form over the UNION
    val batch = emb(10L -> Seq(0.97f, 0.02f), 11L -> Seq(0.05f, 0.98f))
    val v2 = IvfStore.ingestBatch(batch, root)
    assert(IvfStore.modelVersionOf(spark, root, v2) == 1L,
      "append tick must keep the model its postings were assigned under")
    val all = df.union(batch)
    assert(rows(IvfStore.annIvfSelf(spark, root, k = 4, nProbe = 2, nQueries = 2))
      == rows(Similarity.annIvf(all, nCentroids = 2, k = 4, nProbe = 2, nQueries = 2)))
    // a refresh tick advances the paired model ref with its snapshot; at
    // full probe every cell is scanned, so parity with the self-contained
    // form holds regardless of which model assigned the cells
    val batch2 = emb(20L -> Seq(0.6f, 0.4f))
    val v3 = IvfStore.ingestBatch(batch2, root, refreshModel = true)
    assert(IvfStore.modelVersionOf(spark, root, v3) == 2L)
    val all2 = all.union(batch2)
    assert(rows(IvfStore.annIvfSelf(spark, root, k = 4, nProbe = 2, nQueries = 2))
      == rows(Similarity.annIvf(all2, nCentroids = 2, k = 4, nProbe = 2, nQueries = 2)))
    spark.catalog.clearCache()
  }

  test("IvfStore: a tickId makes the refresh tick crash-idempotent (model and postings)") {
    import graft.operators.{CentroidStore, IvfStore, ManifestTable}
    val df = emb(0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f),
      2L -> Seq(0.9f, 0.1f), 3L -> Seq(0.1f, 0.9f))
    val root = java.nio.file.Files.createTempDirectory("graft_ivftick").toString
    IvfStore.build(df, root, nCentroids = 2)
    val batch = emb(10L -> Seq(0.8f, 0.3f))
    // simulate a crash BETWEEN the tick's two commits: the model refresh
    // landed, the postings commit did not — then replay the whole tick
    CentroidStore.refresh(batch, s"$root/model", tick = Some("t1"))
    val mvCrash = CentroidStore.versions(spark, s"$root/model").last
    val wCrash = CentroidStore.readWeightsAt(spark, s"$root/model", mvCrash)
    val v2 = IvfStore.ingestBatch(batch, root, refreshModel = true, tickId = Some("t1"))
    // the replay must NOT refresh again: same model version, same weights
    // (a double-apply would re-absorb the batch mass — silent model skew)
    assert(CentroidStore.versions(spark, s"$root/model").last == mvCrash)
    assert(CentroidStore.readWeightsAt(spark, s"$root/model", mvCrash) == wCrash)
    assert(IvfStore.modelVersionOf(spark, root, v2) == mvCrash)
    // full replay after BOTH commits landed: the same version comes back
    // and nothing re-commits (no duplicate postings append)
    val v2b = IvfStore.ingestBatch(batch, root, refreshModel = true, tickId = Some("t1"))
    assert(v2b == v2)
    assert(ManifestTable.currentVersion(spark, s"$root/postings").contains(v2))
    assert(CentroidStore.versions(spark, s"$root/model").last == mvCrash)
    // the tick still produced a correct index: full-probe search parity
    // with the self-contained form over the union
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect().map(_.toSeq).toSet
    assert(rows(IvfStore.annIvfSelf(spark, root, k = 4, nProbe = 2, nQueries = 2))
      == rows(Similarity.annIvf(df.union(batch), nCentroids = 2, k = 4,
        nProbe = 2, nQueries = 2)))
    spark.catalog.clearCache()
  }

  test("graft_dot propagates a null element as NULL, not 0.0 (codegen + interpreted)") {
    graft.functions.VectorExpressions.register(spark)
    // codegen path (Project under whole-stage codegen)
    val rows = spark.sql(
      """SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS ok,
        |       graft_dot(array(1.0D, CAST(NULL AS DOUBLE)), array(3.0D, 4.0D)) AS withNull
        |""".stripMargin).collect()
    assert(rows(0).getDouble(0) == 11.0)
    assert(rows(0).isNullAt(1))
    // interpreted path (direct eval, no codegen)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val nullable = ArrayType(DoubleType, containsNull = true)
    val lhs = Literal.create(new GenericArrayData(Array[Any](1.0, null)), nullable)
    val rhs = Literal.create(new GenericArrayData(Array[Any](3.0, 4.0)), nullable)
    val expr = graft.functions.DotProduct(lhs, rhs)
    assert(expr.nullable)
    assert(expr.eval(null) == null)
    val full = graft.functions.DotProduct(rhs, rhs)
    assert(full.eval(null) == 25.0)
  }

  test("incrementalEmbeddingNearDups: best corpus match per new vector, corpus pruned by broadcast semi-join") {
    val corpus = emb(
      1L -> Seq(1f, 0f, 0f),      // exact dup of new 101
      2L -> Seq(0.95f, 0.05f, 0f), // weaker match for 101
      3L -> Seq(0f, 1f, 0f))
    val batch = emb(
      101L -> Seq(1f, 0f, 0f),
      102L -> Seq(0f, 0f, 1f))    // orthogonal to everything -> keeper
    val out = Similarity.incrementalEmbeddingNearDups(batch, corpus)
    val rows = out.collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("new_id") == 101L)
    assert(rows.head.getAs[Long]("dup_of") == 1L) // cosine 1.0 beats the 0.95 neighbor
    assert(rows.head.getAs[Double]("cosine") == 1.0)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), "corpus must be pruned by a semi-join")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      "batch band keys must broadcast; the corpus never shuffles for the prune")
    spark.catalog.clearCache()
  }
}
