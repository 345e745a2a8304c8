package graft

import org.apache.spark.sql.functions._

/** Dev utility: per-stage wall-clock breakdown of the corpus-pipeline tail
  * (the bench's heaviest queries), using only the public stage operators so
  * it can never drift from the pipeline's real wiring. Iteration tooling
  * only — not part of any gate (same role as Bench's single-query filter).
  * Stage timings on this box vary ~2-3× run-to-run with host contention;
  * compare stages within one run, not across runs.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import operators._
    def t[A](name: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"PROFILE $name%-28s ${(System.nanoTime() - s) / 1e9}%8.2f s")
      r
    }
    // warm codegen/JIT once at the smallest SF so stage timings aren't
    // dominated by first-run compilation (Bench does the same); falls back
    // to the profiled dir when the standard small fixture is absent
    val warmDir =
      if (new java.io.File("/root/testdata/sf0.001/documents.parquet").exists())
        "/root/testdata/sf0.001"
      else dir
    t("warm") {
      Corpus.corpusPipeline(Tables.documents(spark, warmDir))
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
    }
    val docs = Tables.documents(spark, dir)
    val clean = t("stage1_clean_stats") {
      val c = Corpus.cleanCorpusStats(docs)
      c.count(); c
    }
    val red = t("stage2_3_scrub_redact") {
      val r = TextOps.scrubBoilerplate(docs, passthrough = Seq("lang", "source"))
        .filter(length(col("clean_text")) > 0)
        .select(col("doc_id"), col("lang"), col("source"),
          TextOps.redactPii(col("clean_text")).as("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      r.count(); r
    }
    t("stage4_perplexity") { TextOps.perplexityScores(red).filter(col("keep")).count() }
    t("stage4_classifier") { TextOps.classifierScores(red).filter(col("label")).count() }
    t("stage5_contamination") {
      Corpus.contaminationScores(red).filter(!col("flagged")).count()
    }
    spark.catalog.clearCache()
    t("full_corpus_pipeline") { Corpus.corpusPipeline(docs).count() }
    t("full_pipeline_incremental") { Corpus.corpusPipelineIncremental(docs).count() }

    // ---- the arrival-order (incremental) stage-1 chain, attributed ----
    // the suite-tail queries (q_corpus_funnel_incremental /
    // q_corpus_pipeline_incremental) = this chain + the shared tail above
    spark.catalog.clearCache()
    val cleanI = t("inc_stage1_clean") {
      val c = docs.filter(TextOps.qualityScore(col("text")) >= 0.70)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      c.count(); c
    }
    val exactI = t("inc_stage1_exact_dedup") {
      val e = Dedup.keepMinBy(cleanI, md5(col("text")),
        struct(col("doc_id") % 3, col("doc_id")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      e.count(); e
    }
    t("inc_wave_fold_3") { Dedup.sequentialIngest(exactI, 3).count() }
    spark.catalog.clearCache()
    t("full_funnel_incremental") {
      Corpus.pipelineFunnelIncremental(docs).count()
    }
    spark.stop()
  }
}
