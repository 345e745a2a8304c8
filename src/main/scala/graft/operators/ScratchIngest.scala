package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** TEMPORARY dev scratch: per-step timing of the sequentialIngest fold
  * (round-15 optimization measurements; same non-gate role as Profile).
  */
object ScratchIngest {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"INGEST $name%-36s ${(System.nanoTime() - s) / 1e9}%8.2f s")
      r
    }
    // per-job wall times with stage counts — attribute the eager actions
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        private val starts =
          scala.collection.concurrent.TrieMap.empty[Int, (Long, Int)]
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts(js.jobId) = (System.nanoTime(), js.stageInfos.size)
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          starts.remove(je.jobId).foreach { case (s, nst) =>
            val ms = (System.nanoTime() - s) / 1e6
            if (ms > 50)
              println(f"  JOB ${je.jobId}%4d stages=$nst%3d ${ms / 1000}%7.3f s")
          }
      })
    // warm
    t("warm")(Dedup.sequentialIngest(
      graft.Tables.documents(spark, "/root/testdata/sf0.001"))
      .write.format("noop").mode("overwrite").save())
    spark.catalog.clearCache()

    val docs = graft.Tables.documents(spark, dir)
    val nBatches = 3
    val threshold = 0.5
    val cap = Dedup.MaxBucketSize

    (1 to 2).foreach { round =>
      var store: Option[DataFrame] = None
      t(s"round$round TOTAL") {
        (0 until nBatches).foreach { i =>
          val batchSigs = t(s"r$round w$i sigs_build") {
            Dedup.shingleSignatures(docs.filter(col("doc_id") % nBatches === i))
              .persist(StorageLevel.MEMORY_AND_DISK)
          }
          // mirror ingestTick manually with timers
          val rem = store match {
            case Some(st) =>
              val dupIds = t(s"r$round w$i verify_vs_store(plan)") {
                val m = classOf[Dedup.type].getDeclaredMethods
                  .find(_.getName == "incrementalVerified").get
                m.setAccessible(true)
                m.invoke(Dedup, batchSigs, st,
                  Double.box(threshold), Int.box(cap))
                  .asInstanceOf[DataFrame]
                  .select(col("new_id").as("doc_id")).distinct()
              }
              batchSigs.join(dupIds, Seq("doc_id"), "left_anti")
                .persist(StorageLevel.MEMORY_AND_DISK)
            case None => batchSigs
          }
          val pairs = t(s"r$round w$i band_pairs(plan)") {
            val m = classOf[Dedup.type].getDeclaredMethods
              .find(_.getName == "pairsFromShingleSigs").get
            m.setAccessible(true)
            m.invoke(Dedup, rem, Int.box(Dedup.NumHashes / Dedup.NumBands),
              Double.box(threshold), Int.box(cap)).asInstanceOf[DataFrame]
          }
          val nonCanonical = t(s"r$round w$i components(EAGER)") {
            Dedup.connectedComponents(pairs.select(col("doc_a"), col("doc_b")))
              .filter(col("node") =!= col("component"))
              .select(col("node").as("doc_id"))
          }
          val keep = t(s"r$round w$i keep_localCheckpoint(EAGER)") {
            rem.join(nonCanonical, Seq("doc_id"), "left_anti").localCheckpoint()
          }
          store = Some(store.map(_.union(keep)).getOrElse(keep))
        }
        t(s"r$round final_union_noop") {
          store.get.select(col("doc_id")).write.format("noop")
            .mode("overwrite").save()
        }
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
