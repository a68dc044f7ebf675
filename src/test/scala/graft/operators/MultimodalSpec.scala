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

  test("decodeImages: REAL JDK codec round-trip — dimensions, channels, " +
      "luma and 8x8 thumb from generated PNG/BMP bytes; bad bytes flagged") {
    import java.awt.image.BufferedImage
    def pngBytes(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          // deterministic gradient: left half black, right half white
          val v = if (x >= w / 2) 0xffffff else 0x000000
          img.setRGB(x, y, v); x += 1
        }
        y += 1
      }
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, buf)
      buf.toByteArray
    }
    val rows = Seq(
      (1L, pngBytes(64, 32, "png")),
      (2L, pngBytes(16, 16, "bmp")),
      (3L, "not an image".getBytes("UTF-8")),
      (4L, null.asInstanceOf[Array[Byte]]))
    val assets = rows.toDF("asset_id", "payload")
    val got = Multimodal.decodeImages(assets)
      .select(col("asset_id"), col("decode_ok"), col("width"),
        col("height"), col("n_channels"), col("mean_luma"), col("thumb8"))
      .as[(Long, Boolean, Option[Int], Option[Int], Option[Int],
        Option[Double], Option[Seq[Int]])]
      .collect().sortBy(_._1)
    assert(got.map(r => (r._1, r._2)).toSeq ==
      Seq((1L, true), (2L, true), (3L, false), (4L, false)))
    val png = got(0); val bmp = got(1)
    assert(png._3.contains(64) && png._4.contains(32))
    assert(bmp._3.contains(16) && bmp._4.contains(16))
    assert(png._5.contains(3)) // RGB
    // half-black/half-white: thumb columns 0-3 are 0, 4-7 are 255,
    // mean luma 127.5 exactly (box averages never straddle the edge)
    val t = png._7.get
    assert(t.length == 64)
    assert(t.zipWithIndex.forall { case (v, i) =>
      if (i % 8 < 4) v == 0 else v == 255 })
    assert(png._6.contains(127.5))
    // decode is partitioning-independent
    val re = Multimodal.decodeImages(assets.repartition(5))
      .select(col("asset_id"), col("decode_ok"), col("mean_luma"))
      .as[(Long, Boolean, Option[Double])].collect().sortBy(_._1).toSeq
    assert(re == got.map(r => (r._1, r._2, r._6)).toSeq)
  }

  test("resizeImages: REAL nearest-neighbor resize re-encodes a " +
      "decodable PNG at the target dimensions; bad bytes pass through " +
      "with a NULL png") {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(40, 20, BufferedImage.TYPE_INT_RGB)
    (0 until 20).foreach(y => (0 until 40).foreach(x =>
      img.setRGB(x, y, if ((x / 10 + y / 10) % 2 == 0) 0xff0000 else 0x00ff00)))
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val assets = Seq((1L, buf.toByteArray),
      (2L, Array[Byte](1, 2, 3))).toDF("asset_id", "payload")
    val out = Multimodal.resizeImages(assets, 8, 8)
      .select(col("asset_id"), col("target_width"), col("png"))
      .as[(Long, Int, Option[Array[Byte]])].collect().sortBy(_._1)
    assert(out.map(_._2).toSeq == Seq(8, 8))
    assert(out(1)._3.isEmpty, "undecodable payload must yield NULL png")
    val thumb = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(0)._3.get))
    assert(thumb.getWidth == 8 && thumb.getHeight == 8)
    // nearest-neighbor keeps the checkerboard's exact corner colors
    assert((thumb.getRGB(0, 0) & 0xffffff) == 0xff0000)
    assert((thumb.getRGB(7, 0) & 0xffffff) == 0x00ff00)
  }
}
