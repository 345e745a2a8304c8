package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** TEMPORARY dev scratch for round-15 optimization measurements (same role
  * as graft.Profile; not part of any gate). Times the corpus-pipeline tail
  * stage-by-stage at bench fidelity (noop sink) and compares funnel
  * variants.
  */
object ScratchProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t[A](name: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"SCRATCH $name%-32s ${(System.nanoTime() - s) / 1e9}%8.2f s")
      r
    }
    // warm codegen at sf0.001
    val warm = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    t("warm_pipeline")(noop(Corpus.corpusPipeline(warm)))
    t("warm_funnel")(noop(Corpus.pipelineFunnel(warm)))
    spark.catalog.clearCache()

    val docs = graft.Tables.documents(spark, dir)

    // ---- tail stage attribution at bench fidelity ----
    val clean = docs.filter(TextOps.qualityScore(col("text")) >= 0.70)
    val deduped = Dedup.keepMinBy(clean, md5(col("text")), col("doc_id"))
    val groups = Dedup.connectedComponents(
      Dedup.minhashLshPairs(deduped).select(col("doc_a"), col("doc_b")))
    val survivors = deduped
      .join(groups, deduped("doc_id") === groups("node"), "left")
      .filter(col("node").isNull || col("component") === col("doc_id"))
      .drop("node", "component")
      .localCheckpoint(false)
    t("A_survivors")(noop(survivors))

    val red = TextOps.scrubBoilerplate(survivors, passthrough = Seq("lang", "source"))
      .filter(length(col("clean_text")) > 0)
      .select(col("doc_id"), col("lang"), col("source"),
        TextOps.redactPii(col("clean_text")).as("text"))
      .localCheckpoint(false)
    t("B_scrub_redact")(noop(red))

    val (cb0, lmV) = TextOps.perplexityModel(red)
    val lmB = cb0.persist(StorageLevel.MEMORY_AND_DISK)
    val pKeep = TextOps.perplexityScoresWith(red, lmB, lmV, threshold = 3.5)
      .filter(col("keep")).select(col("doc_id"))
    val cKeep = TextOps.classifierScores(red).filter(col("label"))
      .select(col("doc_id"))
    val gated = red
      .join(pKeep, Seq("doc_id"), "left_semi")
      .join(cKeep, Seq("doc_id"), "left_semi")
      .localCheckpoint(false)
    t("C_model_gates")(noop(gated))

    val train = gated.join(
      Sampling.trainValTestSplit(gated, col("doc_id"))
        .filter(col("split") === "train").select(col("doc_id")),
      Seq("doc_id"), "left_semi")
    t("D_train_split")(noop(train))

    val held = Corpus.heldOutShingles(gated)
    t("E_held_shingles")(noop(held))
    val decon = train.join(
      Corpus.contaminationScoresWith(gated, held, flagAt = 0.2)
        .filter(!col("flagged")).select(col("doc_id")),
      Seq("doc_id"), "left_semi")
    val toks = decon.select(col("source"), col("doc_id"),
      size(regexp_extract_all(col("text"), lit(TextOps.tokenPattern), lit(0)))
        .cast("long").as("n_tokens"))
      .localCheckpoint(false)
    t("F_decon_toks")(noop(toks))

    import org.apache.spark.sql.expressions.Window
    val perSource = toks.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("src_tokens"))
    val total = perSource.agg(sum(col("src_tokens")).as("__t"))
    val budgets = perSource.crossJoin(broadcast(total))
      .withColumn("__q", floor(
        sqrt(col("src_tokens").cast("double") / col("__t")) * lit(1.0e9)).cast("long"))
      .withColumn("__denom", sum(col("__q")).over(Window.partitionBy()))
      .select(col("source"),
        floor(bround(col("__q").cast("double") / col("__denom"), 4)
          * 20000L).cast("long").as("budget"))
    val wCum = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val kept = toks
      .withColumn("__cum", sum(col("n_tokens")).over(wCum))
      .join(broadcast(budgets), Seq("source"))
      .filter(col("__cum") - col("n_tokens") < col("budget"))
      .localCheckpoint(false)
    t("G_budget_kept")(noop(kept))

    val ranked = Sampling.trainingOrder(kept.select(col("doc_id")), "graft")
      .join(kept.select(col("doc_id"), col("n_tokens")), Seq("doc_id"))
      .withColumn("shard", col("train_rank") % 8)
    val wPack = Window.partitionBy(col("shard")).orderBy(col("train_rank"))
    val manifest = ranked
      .withColumn("__cum", sum(col("n_tokens")).over(wPack))
      .withColumn("bin", expr(s"(__cum - n_tokens) div 1024"))
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"))
    t("H_manifest")(noop(manifest))

    spark.catalog.clearCache()
    t("FULL_pipeline_again")(noop(Corpus.corpusPipeline(docs)))
    spark.catalog.clearCache()
    t("FULL_funnel_again")(noop(Corpus.pipelineFunnel(docs)))
    spark.catalog.clearCache()
    spark.stop()
  }
}
