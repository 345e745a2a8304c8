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

  /** REAL image decoder through the same [[Decoder]] seam: javax.imageio —
    * the JDK's built-in PNG/JPEG/BMP/GIF readers, no external codec
    * dependency. Features are the `dim`-bucket luminance histogram as
    * fractions of the pixel count (order-free per image → deterministic
    * across partitionings). Undecodable payloads fail LOUDLY — a corrupt
    * image in a training corpus should surface, not silently become a
    * feature vector of zeros.
    *
    * This validates the seam's contract against actual binary formats: the
    * plumbing ([[decodeFeatures]], partition-wise execution, columnar
    * feature output) is identical to the [[FakeDecoder]] path the oracles
    * exercise.
    */
  object ImageDecoder extends Decoder {
    // never spill decode scratch to disk-backed stream caches on executors
    javax.imageio.ImageIO.setUseCache(false)

    def decode(payload: Array[Byte]): java.awt.image.BufferedImage = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      require(img != null, s"undecodable image payload (${payload.length} bytes)")
      img
    }

    def featuresOf(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
      val hist = new Array[Long](dim)
      val (w, h) = (img.getWidth, img.getHeight)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
          hist(math.min(dim - 1, lum * dim / 256)) += 1L
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      hist.map(c => c.toFloat / n)
    }

    def features(payload: Array[Byte], dim: Int): Array[Float] =
      featuresOf(decode(payload), dim)
  }

  /** md5 hex of decoded content — the digest column the three codec
    * queries carry. The digest input is the HEX ENCODING of the decoded
    * bytes (not the raw bytes): the synthesized payloads make the decoded
    * content an analytic function of the row metadata, so the DuckDB
    * oracle reproduces the digest with `md5(string_agg(printf('%02x', …)))`
    * — and DuckDB's `md5` accepts strings only, hence hex on both sides.
    * Any decode drift (codec, raster layout, sample order) still changes
    * the digest; the oracle turns that from a rows-only check into a full
    * hash check.
    */
  private[graft] def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

  private val HexChars = "0123456789abcdef".toCharArray

  /** Lowercase hex of `bytes` — the canonical digest input. */
  private[graft] def hexStr(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(2 * i) = HexChars(b >> 4)
      out(2 * i + 1) = HexChars(b & 0xf)
      i += 1
    }
    new String(out)
  }

  /** The content digest: md5 of the hex encoding of the decoded bytes.
    * The hex goes straight to ASCII bytes — same bytes [[hexStr]] encodes,
    * without the intermediate String + re-encode pass (this runs once per
    * row over megapixel rasters; see MultimodalSpec's equivalence pin).
    */
  private[graft] def contentDigest(bytes: Array[Byte]): String = {
    val hex = new Array[Byte](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      hex(2 * i) = HexChars(b >> 4).toByte
      hex(2 * i + 1) = HexChars(b & 0xf).toByte
      i += 1
    }
    md5Hex(hex)
  }

  /** Decoded pixels as canonical (r, g, b) byte triplets in row-major
    * order — the digest input, independent of the image's internal raster
    * layout.
    */
  private[graft] def pixelBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val out = new Array[Byte](img.getWidth * img.getHeight * 3)
    var i = 0
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        out(i) = ((rgb >> 16) & 0xff).toByte
        out(i + 1) = ((rgb >> 8) & 0xff).toByte
        out(i + 2) = (rgb & 0xff).toByte
        i += 3
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decoded samples as little-endian 16-bit bytes — the audio digest
    * input.
    */
  private[graft] def sampleBytes(samples: Array[Short]): Array[Byte] = {
    val out = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      out(2 * i) = (samples(i) & 0xff).toByte
      out(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Decoded-image row: REAL width/height read back from the binary payload
    * plus the first/last luminance-histogram features and the decoded-pixel
    * digest. `n_bytes` is the DECODED content size (width·height·3 pixel
    * bytes, the digest input) — the encoded payload length is an input
    * property already covered (with a full oracle) by [[mediaMetaQuery]],
    * and a zlib-compressed PNG length has no SQL oracle; the decoded size
    * does.
    */
  case class DecodedMedia(media_id: Long, width: Int, height: Int,
                          n_bytes: Long, f0: Float, f_last: Float,
                          pix_md5: String)

  /** Deterministic REAL PNG payloads synthesized from the `documents`
    * metadata (this container ships no image files): pixel (x, y) of image
    * id is the gray value (id·31 + x·7 + y·13) mod 256, encoded through the
    * genuine PNG writer — so the decode side exercises a real codec on real
    * bytes. One encoder per partition, map-side only.
    */
  def imageTable(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    synthInput(docs).mapPartitions { rows =>
      rows.map { r =>
        val img = new java.awt.image.BufferedImage(
          r.width, r.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < r.height) {
          var x = 0
          while (x < r.width) {
            val g = ((r.media_id * 31 + x * 7 + y * 13) % 256).toInt
            img.setRGB(x, y, (g << 16) | (g << 8) | g)
            x += 1
          }
          y += 1
        }
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", out)
        r.copy(kind = "image", payload = out.toByteArray, sample_rate = 0)
      }
    }
  }

  /** Driver query for the real-codec path: synthesize PNGs → decode with
    * [[ImageDecoder]] → REAL width/height + histogram features + decoded-
    * pixel digest. FULLY oracled: PNG is lossless and the synthesized
    * pixels are an analytic function of the row metadata, so every output
    * column — including `pix_md5` — is reproduced by a pure-SQL DuckDB
    * oracle (`OraclesML.mediaDecodeSql`); a decoder that returned anything
    * but the exact ground-truth raster fails the hash check.
    */
  def mediaDecodeQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    imageTable(graft.Tables.documents(spark, dir)).mapPartitions { rows =>
      rows.map { r =>
        val img = ImageDecoder.decode(r.payload)
        val f = ImageDecoder.featuresOf(img, 16)
        DecodedMedia(r.media_id, img.getWidth, img.getHeight,
          img.getWidth.toLong * img.getHeight * 3, f(0), f(15),
          contentDigest(pixelBytes(img)))
      }
    }.toDF()
  }

  /** REAL audio decoder through the same [[Decoder]] seam: javax.sound's
    * built-in WAV reader (headless-safe — file parsing, no audio device).
    * Features are the `dim`-bucket |amplitude| histogram as fractions of
    * the sample count (the audio analog of [[ImageDecoder]]'s luminance
    * histogram — order-free, deterministic). Undecodable payloads fail
    * loudly, same stance as the image path.
    */
  object AudioDecoder extends Decoder {
    /** (format, 16-bit little-endian mono samples) of a WAV payload. */
    def decode(payload: Array[Byte]): (javax.sound.sampled.AudioFormat, Array[Short]) = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"expected 16-bit mono WAV, got $fmt")
      val bytes = in.readAllBytes()
      val n = bytes.length / 2
      val samples = new Array[Short](n)
      var i = 0
      while (i < n) {
        samples(i) = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort
        i += 1
      }
      (fmt, samples)
    }

    def featuresOf(samples: Array[Short], dim: Int): Array[Float] = {
      val hist = new Array[Long](dim)
      var i = 0
      while (i < samples.length) {
        val amp = math.min(32767, math.abs(samples(i).toInt))
        hist(math.min(dim - 1, amp * dim / 32768)) += 1L
        i += 1
      }
      hist.map(c => c.toFloat / samples.length)
    }

    def features(payload: Array[Byte], dim: Int): Array[Float] = {
      val (_, samples) = decode(payload)
      featuresOf(samples, dim)
    }
  }

  /** Decoded-audio row: format metadata read back from the REAL WAV header
    * plus amplitude summary features and the decoded-sample digest.
    * `n_bytes` is the DECODED PCM size (n_samples·2, the digest input) —
    * see [[DecodedMedia]] for the rationale.
    */
  case class DecodedAudio(media_id: Long, sample_rate: Int, n_samples: Long,
                          n_bytes: Long, peak: Int, f0: Float, f_last: Float,
                          pcm_md5: String)

  /** Deterministic REAL WAV payloads (this container ships no audio files):
    * sample i of row id is the 16-bit value ((id·31 + i·7) mod 256 − 128)·256,
    * written through the genuine javax.sound WAV encoder — RIFF header,
    * PCM_SIGNED 16-bit mono at the row's sample_rate. One encoder pass per
    * partition, map-side only.
    */
  def audioTable(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    synthInput(docs).mapPartitions { rows =>
      rows.map { r =>
        val n = r.width * 16
        val raw = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val s = (((r.media_id * 31 + i * 7) % 256) - 128).toInt * 256
          raw(2 * i) = (s & 0xff).toByte
          raw(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(raw), fmt, n.toLong)
        val out = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
        r.copy(kind = "audio", payload = out.toByteArray, sample_rate = 16000)
      }
    }
  }

  /** Driver query for the real audio path: synthesize WAVs → decode with
    * [[AudioDecoder]] → format metadata read back from the header +
    * amplitude features + decoded-sample digest. FULLY oracled like
    * [[mediaDecodeQuery]]: PCM WAV is lossless and the samples are an
    * analytic function of the row metadata (`OraclesML.audioDecodeSql`).
    */
  def audioDecodeQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    audioTable(graft.Tables.documents(spark, dir)).mapPartitions { rows =>
      rows.map { r =>
        val (fmt, samples) = AudioDecoder.decode(r.payload)
        val f = AudioDecoder.featuresOf(samples, 16)
        var peak = 0
        var i = 0
        while (i < samples.length) {
          peak = math.max(peak, math.abs(samples(i).toInt)); i += 1
        }
        DecodedAudio(r.media_id, fmt.getSampleRate.toInt, samples.length.toLong,
          samples.length.toLong * 2, peak, f(0), f(15),
          contentDigest(sampleBytes(samples)))
      }
    }.toDF()
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

  /** [[mediaTable]] with the payload BLANKED — the input the codec
    * synthesizers ([[imageTable]]/[[audioTable]]/[[videoTable]]) map over.
    * They derive their payload purely from (media_id, width, height) and
    * overwrite `payload` in the row copy, so the text bytes the shared
    * mediaTable carries were read from parquet and pushed through the
    * Dataset encoder per row only to be thrown away; blanking the column
    * lets column pruning drop `text` from the scan entirely. Output rows
    * are identical — `payload` never survives the copy.
    */
  private def synthInput(docs: DataFrame)
      : org.apache.spark.sql.Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    mediaTable(docs)
      .withColumn("payload", lit(Array.empty[Byte]))
      .as[MediaRow]
  }

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

  /** Decoded-frame row: one sampled video frame, REAL dims read back from
    * the frame bytes plus its luminance-histogram features and the
    * decoded-pixel digest. `n_bytes` is the DECODED frame size
    * (width·height·3) — see [[DecodedMedia]] for the rationale.
    */
  case class DecodedFrame(media_id: Long, frame_idx: Int, width: Int,
                          height: Int, n_bytes: Long, f0: Float, f_last: Float,
                          pix_md5: String)

  /** Fixed dims for synthesized video frames: the frame byte size must be a
    * pure function of the dims so [[sampleFrames]]' fixed-stride slicing
    * lands exactly on frame boundaries.
    */
  val VideoFrameW = 32
  val VideoFrameH = 24
  val VideoFrames = 8

  private def encodeBmpFrame(id: Long, f: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      VideoFrameW, VideoFrameH, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < VideoFrameH) {
      var x = 0
      while (x < VideoFrameW) {
        val g = ((id * 31 + x * 7 + y * 13 + f * 17) % 256).toInt
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", out)
    out.toByteArray
  }

  /** Encoded size of one video frame — BMP, uncompressed, so a constant for
    * the fixed dims (computed once, driver-side).
    */
  lazy val videoFrameBytes: Int = encodeBmpFrame(0L, 0).length

  /** Deterministic REAL multi-frame video payloads (this container ships no
    * video files): each "video" is [[VideoFrames]] concatenated fixed-size
    * BMP frames — BMP because its uncompressed encoding makes the frame
    * size a pure function of the fixed dims, so frame boundaries are plain
    * byte offsets, exactly the contract [[sampleFrames]] slices by (a real
    * container format would swap this seam for a demuxer, same shape).
    * Pixel (x, y) of frame f is gray (id·31 + x·7 + y·13 + f·17) mod 256.
    * One encoder pass per partition, map-side only.
    */
  def videoTable(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    synthInput(docs).mapPartitions { rows =>
      rows.map { r =>
        val out = new java.io.ByteArrayOutputStream()
        (0 until VideoFrames).foreach(f => out.write(encodeBmpFrame(r.media_id, f)))
        r.copy(kind = "video", payload = out.toByteArray,
          width = VideoFrameW, height = VideoFrameH, sample_rate = 0)
      }
    }
  }

  /** Driver query for the video path — the third real-codec modality next
    * to [[mediaDecodeQuery]] (image) and [[audioDecodeQuery]] (audio):
    * synthesize multi-frame videos → [[sampleFrames]] slices every 4th
    * frame map-side → each sampled frame decodes through the REAL
    * [[ImageDecoder]] (BMP is a javax.imageio built-in) back to its dims +
    * luminance features + decoded-pixel digest. FULLY oracled like the
    * other codec round-trips: BMP is lossless and the frame pixels are an
    * analytic function of (media_id, frame_idx)
    * (`OraclesML.videoFramesSql`).
    */
  def videoFramesQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sampleFrames(videoTable(graft.Tables.documents(spark, dir)).toDF(),
      frameBytes = videoFrameBytes, stride = 4)
      .mapPartitions { frames =>
        frames.map { fr =>
          val img = ImageDecoder.decode(fr.frame_payload)
          val f = ImageDecoder.featuresOf(img, 16)
          DecodedFrame(fr.media_id, fr.frame_idx, img.getWidth, img.getHeight,
            img.getWidth.toLong * img.getHeight * 3, f(0), f(15),
            contentDigest(pixelBytes(img)))
        }
      }.toDF()
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
