package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs =
    Seq((0L, "abcdef " * 30, "en", "s", 210L), (1L, "zyxwvu " * 40, "en", "s", 280L),
      (2L, "qwerty " * 50, "en", "s", 350L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("mediaTable: binary payload + typed metadata, kinds cycle") {
    val m = Multimodal.mediaTable(docs).collect()
    assert(m.map(_.getAs[String]("kind")).toSeq == Seq("image", "audio", "video"))
    val r = m.head
    assert(r.getAs[Array[Byte]]("payload").nonEmpty)
    assert(r.getAs[Int]("width") > 0 && r.getAs[Int]("height") > 0)
  }

  test("decodeFeatures: fixed dim, deterministic, n_bytes = payload length") {
    val m = Multimodal.mediaTable(docs)
    val f1 = Multimodal.decodeFeatures(m, dim = 16).collect().sortBy(_.media_id)
    val f2 = Multimodal.decodeFeatures(m, dim = 16).collect().sortBy(_.media_id)
    assert(f1.forall(_.features.length == 16))
    assert(f1.map(_.features.toSeq).toSeq == f2.map(_.features.toSeq).toSeq)
    assert(f1.head.n_bytes == m.collect().head.getAs[Array[Byte]]("payload").length)
    assert(f1.forall(_.features.forall(v => v >= -1f && v <= 1f)))
  }

  test("sampleFrames: only video rows, strided chunks") {
    val frames = Multimodal.sampleFrames(Multimodal.mediaTable(docs),
      frameBytes = 32, stride = 4).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.media_id == 2L))
    assert(frames.forall(_.frame_payload.length == 32))
    assert(frames.map(_.frame_idx).forall(_ % 4 == 0))
  }

  test("ImageDecoder round-trips a real PNG fixture: dims, histogram mass, black image") {
    // hand-built fixture: 8x6 gradient image encoded through the real codec
    val img = new java.awt.image.BufferedImage(8, 6, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 6; x <- 0 until 8) {
      val g = (x * 32) % 256
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val png = out.toByteArray
    assert(png.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val back = Multimodal.ImageDecoder.decode(png)
    assert(back.getWidth == 8 && back.getHeight == 6)
    val f = Multimodal.ImageDecoder.featuresOf(back, 8)
    // histogram fractions sum to 1; gradient gray values 0,32,...,224 land
    // one-per-bucket → uniform 1/8 mass
    assert(math.abs(f.sum - 1f) < 1e-6)
    assert(f.forall(v => math.abs(v - 0.125f) < 1e-6))
    // all-black: every pixel in bucket 0
    val black = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bout = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(black, "png", bout)
    val bf = Multimodal.ImageDecoder.features(bout.toByteArray, 8)
    assert(bf(0) == 1f && bf.drop(1).forall(_ == 0f))
    // corrupt payload fails loudly
    intercept[IllegalArgumentException] {
      Multimodal.ImageDecoder.decode(Array[Byte](1, 2, 3))
    }
  }

  test("imageTable synthesizes real PNGs and mediaDecodeQuery recovers the true dimensions") {
    val rows = Multimodal.imageTable(docs).collect()
    assert(rows.forall(_.kind == "image"))
    assert(rows.forall(r => r.payload.take(4).toSeq ==
      Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)))
    val meta = Multimodal.mediaTable(docs).select("media_id", "width", "height")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    val decoded = rows.map { r =>
      val img = Multimodal.ImageDecoder.decode(r.payload)
      r.media_id -> ((img.getWidth, img.getHeight))
    }.toMap
    assert(decoded == meta)
    // digest pin: the pix_md5 the registered query emits must equal the
    // digest of pixels derived DIRECTLY from the synthesis formula —
    // codec-independent, so a silently-broken decoder (or a raster-layout
    // change in pixelBytes) flips an observable value
    rows.foreach { r =>
      val (w, h) = meta(r.media_id)
      val expected = new Array[Byte](w * h * 3)
      var i = 0
      for (y <- 0 until h; x <- 0 until w) {
        val g = ((r.media_id * 31 + x * 7 + y * 13) % 256).toByte
        expected(i) = g; expected(i + 1) = g; expected(i + 2) = g
        i += 3
      }
      val img = Multimodal.ImageDecoder.decode(r.payload)
      assert(Multimodal.md5Hex(Multimodal.pixelBytes(img))
        == Multimodal.md5Hex(expected),
        s"decoded-pixel digest drifted for media ${r.media_id}")
    }
  }

  test("AudioDecoder round-trips a real WAV fixture: format, samples, histogram mass") {
    // hand-built WAV: 16 samples of a known ramp through the REAL encoder
    val samples = (0 until 16).map(i => (i * 2048 - 16384).toShort).toArray
    val raw = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      raw(2 * i) = (s & 0xff).toByte; raw(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, samples.length.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val (rfmt, rsamples) = Multimodal.AudioDecoder.decode(out.toByteArray)
    assert(rfmt.getSampleRate == 16000f)
    assert(rsamples.toSeq == samples.toSeq) // bit-exact PCM round-trip
    val f = Multimodal.AudioDecoder.featuresOf(rsamples, 8)
    assert(math.abs(f.sum - 1f) < 1e-6)
    // silence: all mass in bucket 0
    val sf = Multimodal.AudioDecoder.featuresOf(new Array[Short](32), 8)
    assert(sf(0) == 1f && sf.drop(1).forall(_ == 0f))
    // corrupt payload fails loudly
    intercept[Exception] {
      Multimodal.AudioDecoder.decode(Array[Byte](1, 2, 3, 4))
    }
  }

  test("audioTable synthesizes real WAVs and audioDecodeQuery reads back the header") {
    val rows = Multimodal.audioTable(docs).collect()
    assert(rows.forall(_.kind == "audio"))
    assert(rows.forall(r => new String(r.payload.take(4), "US-ASCII") == "RIFF"))
    val meta = Multimodal.mediaTable(docs).select("media_id", "width")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val (fmt, samples) = Multimodal.AudioDecoder.decode(r.payload)
      assert(fmt.getSampleRate == 16000f)
      // sample count = width·16, the synthesis contract
      assert(samples.length == meta(r.media_id) * 16)
      // waveform matches the deterministic generator
      val expected0 = (((r.media_id * 31) % 256) - 128).toInt * 256
      assert(samples(0).toInt == expected0)
      // digest pin: pcm_md5 == digest of the formula-derived samples,
      // codec-independent (see the image test's rationale)
      val expected = (0 until samples.length).map(i =>
        ((((r.media_id * 31 + i * 7) % 256) - 128).toInt * 256).toShort).toArray
      assert(Multimodal.md5Hex(Multimodal.sampleBytes(samples))
        == Multimodal.md5Hex(Multimodal.sampleBytes(expected)),
        s"decoded-sample digest drifted for media ${r.media_id}")
    }
  }

  test("videoTable frames are fixed-size real BMPs; videoFramesQuery decodes the sampled ones") {
    val vids = Multimodal.videoTable(docs).collect()
    assert(vids.forall(_.kind == "video"))
    // payload = VideoFrames concatenated frames, each exactly videoFrameBytes
    val fb = Multimodal.videoFrameBytes
    assert(vids.forall(_.payload.length == fb * Multimodal.VideoFrames))
    // every frame slice decodes standalone through the real codec at the
    // declared dims (the boundary contract sampleFrames relies on)
    val one = vids.head
    (0 until Multimodal.VideoFrames).foreach { f =>
      val img = Multimodal.ImageDecoder.decode(
        one.payload.slice(f * fb, (f + 1) * fb))
      assert(img.getWidth == Multimodal.VideoFrameW
        && img.getHeight == Multimodal.VideoFrameH)
    }
  }

  test("videoFramesQuery: stride-4 sampling, real decode, exact histogram") {
    // run through the registered query shape but on the local fixture docs
    val frames = Multimodal.sampleFrames(
      Multimodal.videoTable(docs).toDF(),
      frameBytes = Multimodal.videoFrameBytes, stride = 4).collect()
    // 8 frames per video, stride 4 -> frames {0, 4} for each of 3 docs
    assert(frames.map(f => (f.media_id, f.frame_idx)).sorted.toSeq ==
      Seq((0L, 0), (0L, 4), (1L, 0), (1L, 4), (2L, 0), (2L, 4)))
    // decode one sampled frame and check the histogram against the pixel
    // formula: gray(x, y) = (id*31 + x*7 + y*13 + f*17) mod 256
    val fr = frames.find(f => f.media_id == 1L && f.frame_idx == 4).get
    val img = Multimodal.ImageDecoder.decode(fr.frame_payload)
    val feats = Multimodal.ImageDecoder.featuresOf(img, 16)
    val expected = new Array[Long](16)
    for (y <- 0 until Multimodal.VideoFrameH; x <- 0 until Multimodal.VideoFrameW) {
      val g = ((1L * 31 + x * 7 + y * 13 + 4 * 17) % 256).toInt
      expected(math.min(15, g * 16 / 256)) += 1L
    }
    val n = (Multimodal.VideoFrameW * Multimodal.VideoFrameH).toFloat
    assert(feats.toSeq == expected.map(_ / n).toSeq)
    assert(math.abs(feats.sum - 1.0f) < 1e-6)
    // digest pin: per-frame pix_md5 == digest of the formula-derived
    // pixels, codec-independent (see the image test's rationale)
    frames.foreach { f =>
      val exp = new Array[Byte](
        Multimodal.VideoFrameW * Multimodal.VideoFrameH * 3)
      var i = 0
      for (y <- 0 until Multimodal.VideoFrameH;
           x <- 0 until Multimodal.VideoFrameW) {
        val g = ((f.media_id * 31 + x * 7 + y * 13 + f.frame_idx * 17) % 256).toByte
        exp(i) = g; exp(i + 1) = g; exp(i + 2) = g
        i += 3
      }
      val dimg = Multimodal.ImageDecoder.decode(f.frame_payload)
      assert(Multimodal.md5Hex(Multimodal.pixelBytes(dimg))
        == Multimodal.md5Hex(exp),
        s"frame digest drifted for (${f.media_id}, ${f.frame_idx})")
    }
  }

  test("contentDigest is md5 over the lowercase-hex encoding (the oracle contract)") {
    // the DuckDB oracles rebuild this digest as md5(string_agg(printf('%02x'…)))
    // — so the Scala side MUST hash the hex STRING, not the raw bytes
    val bytes = Array[Byte](0, 1, 127, -128, -1)
    assert(Multimodal.hexStr(bytes) == "00017f80ff")
    assert(Multimodal.contentDigest(bytes)
      == Multimodal.md5Hex("00017f80ff".getBytes("US-ASCII")))
  }

  test("resizeMeta: scales longest side to maxSide, drops payload") {
    val r = Multimodal.resizeMeta(Multimodal.mediaTable(docs), maxSide = 32).collect()
    assert(r.forall(x => x.getAs[Int]("out_width") <= 32 && x.getAs[Int]("out_height") <= 32))
    assert(!r.head.schema.fieldNames.contains("payload"))
  }
}
