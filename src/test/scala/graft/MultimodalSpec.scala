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

  test("resizeMeta: scales longest side to maxSide, drops payload") {
    val r = Multimodal.resizeMeta(Multimodal.mediaTable(docs), maxSide = 32).collect()
    assert(r.forall(x => x.getAs[Int]("out_width") <= 32 && x.getAs[Int]("out_height") <= 32))
    assert(!r.head.schema.fieldNames.contains("payload"))
  }
}
