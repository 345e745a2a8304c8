package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Bucketed layout must make the fact-fact join shuffle-free. */
class LayoutSpec extends SparkSpec {

  test("compact merges many small files, preserving rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/t"
    val df = Tables.events(spark, "/root/testdata/sf0.001")
    df.repartition(16).write.parquet(dir)
    val rows = spark.read.parquet(dir).count()
    val (before, after) = Layout.compact(spark, dir, targetBytes = 1L << 30)
    assert(before == 16L && after == 1L)
    assert(spark.read.parquet(dir).count() == rows)
  }

  test("compactTable rewrites a manifest sink atomically, preserving snapshot") {
    import graft.operators.{Incremental, ManifestTable}
    import spark.implicits._
    val sink = java.nio.file.Files.createTempDirectory("graft_compact_mt").toString + "/t"
    // 4 append-only commits accrue 4 small files across two partitions
    (1 to 4).foreach { i =>
      val day = if (i <= 2) 1 else 2
      val staging = s"$sink/_staging/tick$i"
      Seq((i.toLong, sqlTs(s"2024-01-0$day 1$i:00:00"), i * 1.0, s"b$i"))
        .toDF("key", "ts", "value", "batch")
        .withColumn("p_date", to_date(col("ts")))
        .write.partitionBy("p_date").parquet(staging)
      val added = ManifestTable.publishFiles(spark, sink, staging)
      ManifestTable.commitReplace(spark, sink, Seq.empty, added)
    }
    assert(ManifestTable.liveFiles(spark, sink).size == 4)
    val rowsBefore = Incremental.readSink(spark, sink).orderBy("key")
      .select("key", "value").as[(Long, Double)].collect().toSeq
    val (before, after) = Layout.compactTable(spark, sink,
      targetBytes = 1L << 30, partitionCols = Seq("p_date"))
    assert(after < before)
    val rowsAfter = Incremental.readSink(spark, sink).orderBy("key")
      .select("key", "value").as[(Long, Double)].collect().toSeq
    assert(rowsAfter == rowsBefore)
    // version advanced exactly once; old files vacuumed
    assert(ManifestTable.liveFiles(spark, sink).size == after.toInt)
  }

  test("bucketed lineitem ⋈ orders has no Exchange in the executed plan") {
    val dir = "/root/testdata/sf0.001"
    Layout.writeBucketed(Tables.lineitem(spark, dir), "li_b", "l_orderkey", buckets = 8)
    Layout.writeBucketed(Tables.orders(spark, dir), "o_b", "o_orderkey", buckets = 8)
    val joined = Layout.bucketedJoin(spark, "li_b", "o_b", "l_orderkey", "o_orderkey")
      .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("q"))
    val n = joined.collect().length
    assert(n > 0)
    val plan = joined.queryExecution.executedPlan.toString
    // one exchange for the final groupBy is fine; the JOIN itself must not
    // shuffle — assert by checking no exchange hashes on the join keys
    assert(!plan.contains("hashpartitioning(l_orderkey"), plan)
    assert(!plan.contains("hashpartitioning(o_orderkey"), plan)
  }
}
