package graft

import org.apache.spark.sql.functions._

/** Loader normalization contracts ([[Tables]]). */
class TablesSpec extends SparkSpec {

  test("events.ts NTZ normalization is session-timezone independent") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    def instants(s: org.apache.spark.sql.SparkSession) =
      Tables.events(s, dir)
        .select(col("event_id"), unix_micros(col("ts")).as("us"))
        .orderBy(col("event_id")).limit(5).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val utc = instants(spark)
    // Tables is a public entry point: a consumer session in a non-UTC zone
    // must read the SAME instants. The stored NTZ wall-clock is UTC, and
    // the normalization must never consult the session time zone — a bare
    // cast("timestamp") would shift every ts by the local offset.
    val ny = spark.newSession()
    ny.conf.set("spark.sql.session.timeZone", "America/New_York")
    assert(instants(ny) == utc)
  }
}
