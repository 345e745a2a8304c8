package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types._

import graft.operators.{CorpusStore, ManifestTable}

/** The corpus store's CHANGE DATA FEED as a Structured Streaming source —
  * a downstream export (feature store refresh, training-data mirror) is a
  * `readStream` instead of a hand-rolled polling loop:
  *
  * {{{
  *   spark.readStream
  *     .format("graft.streaming.StoreChangesSourceProvider")
  *     .option("root", storeRoot)
  *     .option("fromVersion", 0)            // 0 = bootstrap full export
  *     .option("maxVersionsPerTrigger", 10) // admission control
  *     .load()                              // (doc_id, lang, source, text_md5, change)
  * }}}
  *
  * OFFSETS ARE COMMITTED STORE VERSIONS, and each micro-batch is exactly
  * [[CorpusStore.changesBetween]](from, to) — the manifest-arithmetic diff
  * that reads only the files the two snapshots do not share (O(changed
  * files), moved-only rows cancel). Built on the V1 `Source` API (the
  * Delta-CDF shape) deliberately: `getBatch` returns a DataFrame, so the
  * batch IS the existing declarative diff — a DSv2 `MicroBatchStream`
  * would force the two-sided anti-join into imperative per-partition
  * readers and lose the moved-row cancellation.
  *
  * Semantics a consumer must know:
  *   - `fromVersion` absent → the stream starts at the store's CURRENT
  *     version ("changes from now"); 0 → the bootstrap diff (every kept
  *     doc as an insert, then incremental windows).
  *   - RETENTION: a batch reads both endpoint manifests, so the store's
  *     `retainSnapshots` must cover the stream's maximum lag (trigger
  *     interval × restart window) — an aged-out from-version fails the
  *     batch loudly rather than silently skipping changes.
  *   - Delivery is AT-LEAST-ONCE across crash/restart edges (the V1
  *     recovery contract re-runs the last uncommitted window); batches are
  *     keyed diffs, so the intended consumer — an upsert keyed on
  *     `text_md5` applying insert/delete — is idempotent under replay.
  */
class StoreChangesSourceProvider extends StreamSourceProvider
    with DataSourceRegister {
  override def shortName(): String = "graft-store-changes"

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String])
      : (String, StructType) =
    (shortName(), StoreChangesSource.Schema)

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source =
    new StoreChangesSource(sqlContext, parameters)
}

object StoreChangesSource {
  /** [[CorpusStore.changesBetween]]'s exact output shape. */
  val Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("text_md5", StringType),
    StructField("change", StringType)))

  /** Resolve the `internalCreateDataFrame` seam (see [[StoreChangesSource
    * .asStreaming]]) against the session class — called at SOURCE
    * CONSTRUCTION, so a Spark upgrade that renames or re-signatures the
    * method fails the stream at `readStream...load()`/start with an
    * actionable message, never mid-stream at an arbitrary micro-batch.
    */
  private[graft] def resolveInternalCreate(
      sessionClass: Class[_]): java.lang.reflect.Method =
    try sessionClass.getMethod("internalCreateDataFrame",
      classOf[org.apache.spark.rdd.RDD[_]], classOf[StructType],
      java.lang.Boolean.TYPE)
    catch {
      case e: NoSuchMethodException =>
        throw new IllegalStateException(
          s"${sessionClass.getName} no longer exposes " +
            "internalCreateDataFrame(RDD, StructType, boolean) — the " +
            "private[sql] constructor KafkaSource/DeltaSource use to mark " +
            "a V1 Source batch isStreaming=true. This Spark version moved " +
            "the seam: update StoreChangesSource.asStreaming to this " +
            "version's equivalent (or move the class into a " +
            "org.apache.spark.sql shim package).", e)
    }
}

class StoreChangesSource(sqlContext: SQLContext,
                         parameters: Map[String, String]) extends Source {
  private val spark = sqlContext.sparkSession
  private val root = parameters.getOrElse("root",
    throw new IllegalArgumentException(
      "StoreChangesSource requires option 'root' (the CorpusStore root)"))
  private val maxVersionsPerTrigger =
    parameters.get("maxVersionsPerTrigger").map(_.toLong).filter(_ > 0)

  /** The stream's zero point, pinned ONCE at source creation; the
    * checkpoint owns progress afterwards.
    */
  private val startVersion: Long = parameters.get("fromVersion")
    .map(_.toLong)
    .getOrElse(ManifestTable.currentVersion(spark, root).getOrElse(0L))

  /** Admission-control cursor: the highest offset this source has offered
    * or seen (getBatch/commit teach it the checkpoint's position on
    * restart, so a capped getOffset can never offer a window BEHIND the
    * engine's committed progress).
    */
  @volatile private var cursor: Long = startVersion

  override def schema: StructType = StoreChangesSource.Schema

  private def versionOf(o: V1Offset): Long = o.json.trim.toLong
  private def advanceCursor(v: Long): Unit =
    synchronized { if (v > cursor) cursor = v }

  override def getOffset: Option[V1Offset] = {
    val cur = ManifestTable.currentVersion(spark, root).getOrElse(0L)
    if (cur <= startVersion && cursor == startVersion && startVersion > 0)
      None // nothing committed past the zero point yet
    else {
      val next = maxVersionsPerTrigger
        .map(m => math.min(cur, cursor + m)).getOrElse(cur)
        .max(cursor)
      advanceCursor(next)
      if (next == startVersion) None else Some(LongOffset(next))
    }
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val from = start.map(versionOf).getOrElse(startVersion)
    val to = versionOf(end)
    advanceCursor(to) // restart path: learn the checkpoint's position
    val df =
      if (to <= from)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      else CorpusStore.changesBetween(spark, root, from, to)
    asStreaming(df)
  }

  override def commit(end: V1Offset): Unit = advanceCursor(versionOf(end))
  override def stop(): Unit = ()

  /** The V1 engine asserts getBatch's frame carries `isStreaming = true`.
    * The blessed constructor (`internalCreateDataFrame`) is `private[sql]`
    * — public at the bytecode level, and exactly the call KafkaSource /
    * DeltaSource make from inside the `org.apache.spark.sql` namespace —
    * so it is invoked reflectively here rather than squatting a class in
    * Spark's package. Resolution happens ONCE in [[internalCreate]] (at
    * source construction — a loud start-time failure on a Spark that
    * moved the seam); the plan boundary is `queryExecution.toRdd`, the
    * same materialization those sources hand the engine.
    */
  private def asStreaming(df: DataFrame): DataFrame =
    internalCreate.invoke(df.sparkSession,
      df.queryExecution.toRdd, df.schema, java.lang.Boolean.TRUE)
      .asInstanceOf[DataFrame]

  /** Resolved eagerly at construction — see
    * [[StoreChangesSource.resolveInternalCreate]].
    */
  private val internalCreate =
    StoreChangesSource.resolveInternalCreate(spark.getClass)
}
