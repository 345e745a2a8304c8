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
