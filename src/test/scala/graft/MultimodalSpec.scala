package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def media = Multimodal.attachBinary(
    Seq((1L, "hello world"), (2L, "x"), (3L, "a" * 100)).toDF("doc_id", "text"),
    "doc_id", "text", "image")

  test("attachBinary: schema is (id, kind, data binary)") {
    assert(media.schema.map(f => (f.name, f.dataType.typeName)) ==
      Seq(("id", "long"), ("kind", "string"), ("data", "binary")))
  }

  test("decode: partition-batched metadata extraction is deterministic") {
    val metas = Multimodal.decode(media).collect().map(m => m.id -> m).toMap
    assert(metas(1L).nBytes == 11 && metas(2L).nBytes == 1 && metas(3L).nBytes == 100)
    assert(metas(1L).width == 16 + 11 % 64 && metas(1L).height == 16 + 11 % 48)
    assert(metas(1L).nFrames == 1) // image, not video
    // re-running gives identical output (stub is deterministic)
    val again = Multimodal.decode(media).collect().map(m => m.id -> m).toMap
    assert(metas == again)
  }

  test("decode: video kind produces frame counts") {
    val video = Multimodal.attachBinary(
      Seq((9L, "some video payload bytes")).toDF("doc_id", "text"),
      "doc_id", "text", "video")
    val m = Multimodal.decode(video).head()
    assert(m.nFrames == 1 + (m.nBytes % 30).toInt && m.nFrames > 1)
  }

  test("resize and frameSample shrink payloads deterministically") {
    val resized = Multimodal.resize(media, 4)
    val sizes = resized.select(col("id"), length(col("data")))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(sizes == Map(1L -> 4, 2L -> 1, 3L -> 4))
    val sampled = Multimodal.frameSample(media, 10)
    val s3 = sampled.where(col("id") === 3).select(length(col("data"))).head.getInt(0)
    assert(s3 == 10) // 100 bytes / stride 10
  }
}
