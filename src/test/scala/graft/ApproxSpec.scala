package graft

import org.apache.spark.sql.functions._

import graft.operators.Approx

class ApproxSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("approx_count_distinct stays within 5% of exact on testdata") {
    val checked = Approx.approxDistinctChecked(Tables.events(spark, sf)).collect()
    assert(checked.nonEmpty)
    assert(checked.forall(_.getAs[Boolean]("approx_ok")),
      s"out-of-bounds groups: ${checked.filterNot(_.getAs[Boolean]("approx_ok")).mkString(", ")}")
    // raw relative error, independently of the Checked wiring
    val both = Tables.events(spark, sf).groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id"), 0.02).as("est"))
      .collect()
    both.foreach { r =>
      val (exact, est) = (r.getAs[Long]("exact"), r.getAs[Long]("est"))
      assert(math.abs(est - exact) <= 0.05 * exact,
        s"${r.getString(0)}: est $est vs exact $exact")
    }
  }

  test("approx_percentile lands inside the ±5%-rank value envelope") {
    val checked = Approx.approxQuantilesChecked(Tables.documents(spark, sf)).collect()
    assert(checked.nonEmpty)
    assert(checked.forall(_.getAs[Boolean]("approx_ok")))
  }

  test("approx production paths return one sketch row per group") {
    val d = Approx.approxDistinct(Tables.events(spark, sf))
    assert(d.columns.toSeq == Seq("event_type", "approx_users"))
    assert(d.count() == Tables.events(spark, sf).select("event_type").distinct().count())
    val q = Approx.approxQuantiles(Tables.documents(spark, sf))
    val row = q.filter(col("lang").isNotNull).head()
    val qs = row.getAs[scala.collection.Seq[Long]]("approx_quantiles")
    assert(qs.length == 2 && qs(0) <= qs(1))
  }
}
