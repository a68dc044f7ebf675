package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "hello world", "en", "web"),
    (2L, "x", "en", "pdf"))
    .toDF("doc_id", "text", "lang", "source")

  test("ingest produces binary payloads with typed metadata") {
    val assets = Multimodal.ingestAsBinary(docs)
    val row = assets.filter(col("asset_id") === 1L)
      .select(octet_length(col("payload")), col("media_type"))
      .as[(Int, String)].head()
    assert(row == ((11, "application/octet-stream")))
  }

  test("resize stub emits target dims and a bounded thumbnail") {
    val out = Multimodal.resizeStub(Multimodal.ingestAsBinary(docs), 64, 64)
    val rows = out.select(col("asset_id"), col("target_width"),
        octet_length(col("thumb")), col("orig_bytes"))
      .as[(Long, Int, Int, Long)].collect().sortBy(_._1)
    assert(rows(0) == ((1L, 64, 11, 11L))) // 64*64/64=64 cap > 11 bytes
    assert(rows(1) == ((2L, 64, 1, 1L)))
  }

  test("frame sampling fans out one row per stride offset") {
    val frames = Multimodal.sampleFrames(
      Multimodal.ingestAsBinary(docs), stride = 4)
    val offs = frames.filter(col("asset_id") === 1L)
      .select(col("frame_offset")).as[Int].collect().sorted
    assert(offs.toSeq == Seq(0, 4, 8)) // 11 bytes, stride 4
    assert(frames.filter(col("asset_id") === 2L).count() == 1)
  }
}
