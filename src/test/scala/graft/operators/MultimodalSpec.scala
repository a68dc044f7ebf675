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

  test("frame lengths clamp the short tail and tile the payload exactly") {
    val frames = Multimodal.sampleFrames(
      Multimodal.ingestAsBinary(docs), stride = 4)
    // 11-byte asset, stride 4: frames (0,4) (4,4) (8,3) — tail clamped
    val lens = frames.filter(col("asset_id") === 1L)
      .orderBy(col("frame_offset"))
      .select(col("frame_len")).as[Int].collect().toSeq
    assert(lens == Seq(4, 4, 3))
    // 1-byte asset: one frame of length 1, not a full stride
    assert(frames.filter(col("asset_id") === 2L)
      .select(col("frame_len")).as[Int].head() == 1)
    // tiling invariant: sum(frame_len) == payload bytes for every asset
    val cover = frames.groupBy(col("asset_id"))
      .agg(sum(col("frame_len")).as("covered"))
      .as[(Long, Long)].collect().toMap
    assert(cover == Map(1L -> 11L, 2L -> 1L))
  }

  test("binaryFile ingest reads raw files into the asset schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bin")
    try {
      java.nio.file.Files.write(dir.resolve("a.bin"),
        "hello world".getBytes("UTF-8"))
      java.nio.file.Files.write(dir.resolve("b.bin"),
        Array[Byte](1, 2, 3))
      java.nio.file.Files.write(dir.resolve("skip.txt"),
        "not matched".getBytes("UTF-8"))
      val assets = Multimodal.readBinaryAssets(spark, dir.toString,
        glob = "*.bin", mediaType = "application/octet-stream")
      // schema matches the declared asset contract (minus nullability,
      // which the source decides)
      assert(assets.columns.toSeq ==
        Multimodal.assetSchema.fields.map(_.name).toSeq)
      val byPath = assets
        .select(col("meta_source"), octet_length(col("payload")),
          col("asset_id"))
        .as[(String, Int, Long)].collect()
        .map(r => (r._1.split('/').last, r._2, r._3)).sortBy(_._1)
      assert(byPath.map(t => (t._1, t._2)).toSeq ==
        Seq(("a.bin", 11), ("b.bin", 3)))
      // ids are distinct and deterministic (path-hash, not row order)
      assert(byPath.map(_._3).distinct.length == 2)
      // the real source composes with the downstream feature extraction
      val feats = Multimodal.extractFeatures(assets)
      assert(feats.filter(col("n_bytes") === 11).count() == 1)
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete()
    }
  }
}
