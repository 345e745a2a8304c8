package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for a training-data pipeline: media payloads as
  * opaque `binary` columns with typed metadata, decode / feature-extract /
  * resize / frame-sample as partition-wise transforms.
  *
  * The decode step itself is STUBBED (this environment has no image/audio
  * codecs): [[FakeDecoder]] derives deterministic features from the raw
  * bytes. Everything around it — schema, batch shape, partition-wise
  * execution, the explode-shaped frame sampler — is real Spark plumbing and
  * is what carries to a genuine decoder at scale. Swap [[Decoder]] for a
  * JNI/codec-backed implementation without touching the pipeline.
  *
  * Scale design: decode is mapPartitions (one decoder instance per partition,
  * no shuffle); features stay columnar (`Array[Float]`) so they flow straight
  * into [[Similarity]] operators; frame sampling multiplies rows map-side
  * only.
  */
object Multimodal {

  /** Typed media row: payload is an opaque binary column. */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                      width: Int, height: Int, sample_rate: Int)

  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           features: Array[Float])

  case class Frame(media_id: Long, frame_idx: Int, frame_payload: Array[Byte])

  /** Decode/feature-extract contract — the seam where a real codec plugs in.
    * One instance per partition; must be serializable and thread-free.
    */
  trait Decoder extends Serializable {
    def features(payload: Array[Byte], dim: Int): Array[Float]
  }

  /** Deterministic stand-in for a real decoder: folds bytes into `dim`
    * accumulators and scales to [-1, 1]. NOT a real decode — a placeholder
    * with the same signature, batch shape and determinism guarantees.
    */
  object FakeDecoder extends Decoder {
    def features(payload: Array[Byte], dim: Int): Array[Float] = {
      val acc = new Array[Long](dim)
      var i = 0
      while (i < payload.length) {
        acc(i % dim) += (payload(i) & 0xff) * (1 + i % 7)
        i += 1
      }
      acc.map(v => ((v % 1000L) - 500L) / 500.0f)
    }
  }

  /** Synthesized media table over `documents`: text bytes as the payload,
    * deterministic metadata. Stands in for a real (path, bytes, metadata)
    * ingest of images/audio.
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      col("text").cast("binary").as("payload"),
      (col("n_chars") % 64 + 32).cast("int").as("width"),
      (col("n_chars") % 48 + 24).cast("int").as("height"),
      when(col("doc_id") % 3 === 1, 16000).otherwise(0).cast("int").as("sample_rate"))

  /** Partition-wise decode + feature extraction (the mapInPandas analog in
    * Scala: one decoder per partition, rows streamed through it).
    */
  def decodeFeatures(media: DataFrame, dim: Int = 16,
                     decoder: Decoder = FakeDecoder): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
          decoder.features(r.payload, dim))
      }
    }
  }

  /** Frame sampling for video rows: every `stride`-th chunk of the payload
    * becomes a frame (explode-shaped, map-side only).
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 32, stride: Int = 4): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].filter(_.kind == "video").flatMap { r =>
      val nChunks = r.payload.length / frameBytes
      (0 until nChunks by stride).map { c =>
        Frame(r.media_id, c, r.payload.slice(c * frameBytes, (c + 1) * frameBytes))
      }
    }
  }

  /** Metadata "resize": pure columnar transform of the typed metadata (no
    * payload decode — the cheap path a planner should prefer when only
    * metadata is needed).
    */
  def resizeMeta(media: DataFrame, maxSide: Int = 32): DataFrame = {
    val scale = least(lit(1.0), lit(maxSide) / greatest(col("width"), col("height")))
    media.withColumn("scale", scale)
      .withColumn("out_width", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_height", floor(col("height") * col("scale")).cast("int"))
      .drop("payload")
  }

  /** Metadata query for the driver — everything deterministic around the
    * decode seam (payload size, typed metadata, metadata resize) IS
    * SQL-expressible and carries a full DuckDB oracle; only the decoded
    * feature vector is oracled separately (see [[mediaFeatureQuery]]).
    */
  def mediaMetaQuery(spark: SparkSession, dir: String): DataFrame = {
    val media = mediaTable(graft.Tables.documents(spark, dir))
      .withColumn("n_bytes", length(col("payload")).cast("long"))
    resizeMeta(media, maxSide = 32)
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("width"), col("height"), col("sample_rate"),
        col("out_width"), col("out_height"))
  }

  /** Feature query for the driver: media → decode → features flattened to
    * columns. While the decoder is the deterministic [[FakeDecoder]] stub
    * its byte arithmetic is mirrored by a SQL oracle; a real codec would
    * drop the query back to a rows-only check.
    */
  def mediaFeatureQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
    decodeFeatures(mediaTable(docs)).toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("features")(0).as("f0"), col("features")(1).as("f1"),
        element_at(col("features"), -1).as("f_last"))
  }
}
