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

  test("aHash + imageDupPairs: identical pixels through different REAL " +
      "codecs collide at distance 0; a different image stays apart") {
    import java.awt.image.BufferedImage
    def gradient(mirror: Boolean): BufferedImage = {
      val img = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
      (0 until 32).foreach(y => (0 until 32).foreach { x =>
        val v = ((if (mirror) (31 - x) else x) * 8) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      })
      img
    }
    def enc(img: BufferedImage, fmt: String): Array[Byte] = {
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, buf); buf.toByteArray
    }
    val a = gradient(false)
    val rows = Seq(
      (1L, enc(a, "png")), (2L, enc(a, "bmp")), // same pixels, two codecs
      (3L, enc(gradient(true), "png")))         // mirrored image
    val decoded = Multimodal.decodeImages(rows.toDF("asset_id", "payload"))
      .cache()
    val hashes = decoded
      .select(col("asset_id"), Multimodal.aHash(col("thumb8")))
      .as[(Long, Long)].collect().toMap
    assert(hashes(1L) == hashes(2L),
      "same pixels must hash identically across codecs")
    assert(hashes(1L) != hashes(3L))
    val pairs = Multimodal.imageDupPairs(decoded, maxBits = 3)
      .select(col("asset_a"), col("asset_b"), col("dist"))
      .as[(Long, Long, Long)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L)))
    assert(pairs.head._3 == 0L)
    // partitioning independence of the banded pair path
    val re = Multimodal.imageDupPairs(
        Multimodal.decodeImages(rows.toDF("asset_id", "payload")
          .repartition(5)), maxBits = 3)
      .select(col("asset_a"), col("asset_b")).as[(Long, Long)]
      .collect().toSet
    assert(re == pairs.map(p => (p._1, p._2)).toSet)
  }

  test("decodeAudio: REAL JDK WAV decode — rate/channels/frames/duration " +
      "and RMS/ZCR signal features; silence and bad bytes pinned") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    def wav(samples: Array[Short], rate: Float): Array[Byte] = {
      val data = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s, i) =>
        data(2 * i) = (s & 0xff).toByte          // little-endian PCM16
        data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val fmt = new AudioFormat(rate, 16, 1, true, false)
      val in = new AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
      val buf = new java.io.ByteArrayOutputStream()
      AudioSystem.write(in, AudioFileFormat.Type.WAVE, buf)
      buf.toByteArray
    }
    val n = 4000 // 0.5 s at 8 kHz
    val sine = Array.tabulate(n)(i =>
      (0.5 * 32767 * math.sin(2 * math.Pi * 440 * i / 8000.0)).toShort)
    val silence = Array.fill(n)(0.toShort)
    val rows = Seq(
      (1L, wav(sine, 8000f)), (2L, wav(silence, 8000f)),
      (3L, "not audio".getBytes("UTF-8")))
    val got = Multimodal.decodeAudio(rows.toDF("asset_id", "payload"))
      .select(col("asset_id"), col("decode_ok"), col("sample_rate"),
        col("n_channels"), col("n_frames"), col("duration_sec"),
        col("rms"), col("zcr"))
      .as[(Long, Boolean, Option[Double], Option[Int], Option[Long],
        Option[Double], Option[Double], Option[Double])]
      .collect().sortBy(_._1)
    assert(got.map(r => (r._1, r._2)).toSeq ==
      Seq((1L, true), (2L, true), (3L, false)))
    val tone = got(0)
    assert(tone._3.contains(8000.0) && tone._4.contains(1) &&
      tone._5.contains(4000L) && tone._6.contains(0.5))
    // 440 Hz sine at amplitude 0.5: RMS ~ 0.5/sqrt(2), ZCR ~ 2*440/8000
    assert(math.abs(tone._7.get - 0.5 / math.sqrt(2)) < 0.01, s"rms=${tone._7}")
    assert(math.abs(tone._8.get - 0.11) < 0.005, s"zcr=${tone._8}")
    val quiet = got(1)
    assert(quiet._7.contains(0.0) && quiet._8.contains(0.0))
  }

  test("decodeAudio: big-endian AIFF measures the same signal as " +
      "little-endian WAV; unsigned 8-bit decodes but is flagged " +
      "UNMEASURED (features_ok=false, not fake-silent)") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val n = 4000
    val sineS = Array.tabulate(n)(i =>
      (0.5 * 32767 * math.sin(2 * math.Pi * 440 * i / 8000.0)).toShort)
    def pcm16(samples: Array[Short], bigEndian: Boolean,
        tpe: AudioFileFormat.Type): Array[Byte] = {
      val data = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s, i) =>
        val (b0, b1) = if (bigEndian) (((s >> 8) & 0xff), (s & 0xff))
          else ((s & 0xff), ((s >> 8) & 0xff))
        data(2 * i) = b0.toByte; data(2 * i + 1) = b1.toByte
      }
      val fmt = new AudioFormat(8000f, 16, 1, true, bigEndian)
      val in = new AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
      val buf = new java.io.ByteArrayOutputStream()
      AudioSystem.write(in, tpe, buf)
      buf.toByteArray
    }
    def pcm8u(count: Int): Array[Byte] = {
      val data = Array.fill(count)(128.toByte) // unsigned midpoint
      val fmt = new AudioFormat(8000f, 8, 1, false, false)
      val in = new AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, count.toLong)
      val buf = new java.io.ByteArrayOutputStream()
      AudioSystem.write(in, AudioFileFormat.Type.WAVE, buf)
      buf.toByteArray
    }
    val rows = Seq(
      (1L, pcm16(sineS, bigEndian = false, AudioFileFormat.Type.WAVE)),
      (2L, pcm16(sineS, bigEndian = true, AudioFileFormat.Type.AIFF)),
      (3L, pcm8u(n)))
    val got = Multimodal.decodeAudio(rows.toDF("asset_id", "payload"))
      .select(col("asset_id"), col("decode_ok"), col("features_ok"),
        col("duration_sec"), col("rms"))
      .as[(Long, Boolean, Boolean, Option[Double], Option[Double])]
      .collect().sortBy(_._1)
    // both endiannesses decode the identical signal to the identical rms
    assert(got(0)._2 && got(0)._3 && got(1)._2 && got(1)._3)
    assert(got(0)._5 == got(1)._5,
      s"LE rms ${got(0)._5} != BE rms ${got(1)._5}")
    assert(math.abs(got(0)._5.get - 0.5 / math.sqrt(2)) < 0.01)
    // unsigned 8-bit: metadata real, signal features explicitly absent
    assert(got(2)._2 && !got(2)._3, "u8 must be decodable-but-unmeasured")
    assert(got(2)._4.contains(0.5) && got(2)._5.isEmpty)
  }

  /** Assemble a Y4M byte stream: `header` line + one FRAME per
    * luma-value, each frame's Y plane constant at that value, chroma
    * planes zero-filled per the colorspace.
    */
  private def y4mBytes(header: String, w: Int, h: Int, cs: String,
      lumas: Seq[Int]): Array[Byte] = {
    val chroma = cs match {
      case "420" => (w / 2) * (h / 2) * 2
      case "422" => (w / 2) * h * 2
      case "444" => w * h * 2
      case "mono" => 0
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write((header + "\n").getBytes("US-ASCII"))
    lumas.foreach { y =>
      out.write("FRAME\n".getBytes("US-ASCII"))
      out.write(Array.fill[Byte](w * h)(y.toByte))
      out.write(new Array[Byte](chroma))
    }
    out.toByteArray
  }

  test("Y4M real decode: true frame timing from the F rate, measured Y " +
      "mean luma, mono + 420 colorspaces, truncated stream stops at the " +
      "last whole frame, malformed/unsupported headers yield zero rows, " +
      "and per-asset dispatch leaves non-Y4M payloads on the FAKE path") {
    // 4x4 C420 at 2 fps: 5 frames with lumas 10,20,30,40,50; stride 1 s
    // -> step = round(1*2/1) = 2 -> frames 0,2,4 at ts 0.0,1.0,2.0
    val v420 = y4mBytes("YUV4MPEG2 W4 H4 F2:1 Ip A1:1 C420", 4, 4, "420",
      Seq(10, 20, 30, 40, 50))
    // mono, default F absent -> 25:1; stride 0.08 s -> step = 2
    val vMono = y4mBytes("YUV4MPEG2 W2 H2 Cmono", 2, 2, "mono",
      Seq(100, 110, 120))
    val truncated = v420.dropRight(7) // cuts into frame 4's data
    val badCs = y4mBytes("YUV4MPEG2 W4 H4 F2:1 C411", 4, 4, "420", Seq(10))
    val notVideo = Array.fill[Byte](130)(7)
    val assets = Seq(
      (1L, v420), (2L, vMono), (3L, truncated), (4L, badCs),
      (5L, notVideo)).toDF("asset_id", "payload")
    val got = Multimodal.videoFrameFeatures(assets, strideSec = 1.0)
      .as[VideoFrameFeatures].collect()
      .groupBy(_.asset_id).map { case (k, v) =>
        k -> v.sortBy(_.frame_idx).map(f =>
          (f.frame_idx, f.ts_sec, f.mean_luma)).toSeq }
    assert(got(1L) == Seq((0, 0.0, Some(10.0)), (2, 1.0, Some(30.0)),
      (4, 2.0, Some(50.0))))
    // mono at default 25 fps, stride 1 s -> step 25 -> only frame 0
    assert(got(2L) == Seq((0, 0.0, Some(100.0))))
    // truncated: frame 4's bytes are incomplete -> 0 and 2 survive
    assert(got(3L) == Seq((0, 0.0, Some(10.0)), (2, 1.0, Some(30.0))))
    // unsupported colorspace: a real decoder yields nothing on a
    // container it can't parse — never a crash, never fake rows
    assert(!got.contains(4L))
    // non-Y4M payload: the FAKE byte-stride path, luma unmeasured
    assert(got(5L) == Seq((0, 0.0, None), (1, 1.0, None), (2, 2.0, None)))
  }

  // --- MJPEG-AVI fixture assembly: RIFF(AVI  LIST(hdrl avih
  //     LIST(strl strh strf))* LIST(movi NNdc...)) with little-endian
  //     sizes and word-aligned chunks, per the public AVI RIFF layout
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def riffChunk(id: String, data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(id.getBytes("US-ASCII"))
    out.write(le32(data.length))
    out.write(data)
    if (data.length % 2 == 1) out.write(0) // word alignment pad
    out.toByteArray
  }

  private def riffList(listType: String,
      children: Array[Byte]*): Array[Byte] =
    riffChunk("LIST",
      listType.getBytes("US-ASCII") ++ children.flatten)

  private def grayJpeg(w: Int, h: Int, level: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (level << 16) | (level << 8) | level
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** What the engine should measure for a JPEG frame: decode the same
    * bytes, whole-frame integer-BT.601 mean at 6dp (the Y4m/Avi
    * convention) — the spec recomputes it independently.
    */
  private def expectedLuma(jpeg: Array[Byte]): Double = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(jpeg))
    var s = 0L
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val rgb = img.getRGB(x, y)
      s += (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
        114 * (rgb & 0xff)) / 1000
    }
    math.rint(s.toDouble / (img.getWidth * img.getHeight) * 1e6) / 1e6
  }

  private def mjpegAvi(frames: Seq[Array[Byte]], fps: Int, w: Int, h: Int,
      handler: String = "MJPG", audioFirst: Boolean = false): Array[Byte] = {
    val avih = le32(1000000L / fps) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(frames.size) ++ le32(0) ++ le32(if (audioFirst) 2 else 1) ++
      le32(0) ++ le32(w) ++ le32(h) ++ Array.fill(16)(0.toByte)
    def strh(fcc: String, hnd: String, scale: Int, rate: Int) =
      fcc.getBytes("US-ASCII") ++ hnd.getBytes("US-ASCII") ++
        le32(0) ++ le32(0) ++ le32(0) ++ le32(scale) ++ le32(rate) ++
        le32(0) ++ le32(frames.size) ++ le32(0) ++ le32(0) ++ le32(0) ++
        le32(0) ++ le32(0)
    val strfV = le32(40) ++ le32(w) ++ le32(h) ++
      Array[Byte](1, 0, 24, 0) ++ "MJPG".getBytes("US-ASCII") ++
      Array.fill(20)(0.toByte)
    val strlVideo = riffList("strl",
      riffChunk("strh", strh("vids", handler, 1, fps)),
      riffChunk("strf", strfV))
    val strlAudio = riffList("strl",
      riffChunk("strh", strh("auds", "    ", 1, 8000)),
      riffChunk("strf", Array.fill(16)(0.toByte)))
    val strls =
      if (audioFirst) Seq(strlAudio, strlVideo) else Seq(strlVideo)
    val hdrl = riffList("hdrl", (riffChunk("avih", avih) +: strls): _*)
    val vidId = if (audioFirst) "01dc" else "00dc"
    val movi = riffList("movi", frames.map(f => riffChunk(vidId, f)): _*)
    val payload = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ le32(payload.length) ++ payload
  }

  test("AVI/MJPEG real decode: RIFF walk + per-frame ImageIO JPEG, true " +
      "strh timing, audio-first stream numbering, truncated stream " +
      "stops at the last whole frame, non-MJPEG AVI stays on the FAKE " +
      "path") {
    val jpegs = Seq(40, 80, 120, 160, 200).map(grayJpeg(16, 16, _))
    // 4 fps, stride 0.5 s -> step 2 -> frames 0,2,4 at ts 0, 0.5, 1.0
    val plain = mjpegAvi(jpegs, fps = 4, w = 16, h = 16)
    // audio stream first: vids is stream 1, frame chunks are '01dc'
    val audioFirst = mjpegAvi(jpegs, fps = 4, w = 16, h = 16,
      audioFirst = true)
    // cut into the last frame's chunk -> only whole frames survive
    val truncated = plain.dropRight(10)
    // an honest inter-frame codec is NOT decodable here -> FAKE path
    val h264 = mjpegAvi(jpegs.take(1), fps = 4, w = 16, h = 16,
      handler = "H264")
    assert(Avi.isMjpegAvi(plain) && Avi.isMjpegAvi(audioFirst) &&
      Avi.isMjpegAvi(truncated) && !Avi.isMjpegAvi(h264))
    val assets = Seq((1L, plain), (2L, audioFirst), (3L, truncated),
      (4L, h264)).toDF("asset_id", "payload")
    val got = Multimodal.videoFrameFeatures(assets, strideSec = 0.5)
      .as[VideoFrameFeatures].collect()
      .groupBy(_.asset_id).map { case (k, v) =>
        k -> v.sortBy(_.frame_idx).map(f =>
          (f.frame_idx, f.ts_sec, f.mean_luma)).toSeq }
    val want = Seq(0, 2, 4).map(i =>
      (i, i / 4.0, Some(expectedLuma(jpegs(i)))))
    assert(got(1L) == want, s"plain: ${got(1L)}")
    assert(got(2L) == want, s"audio-first: ${got(2L)}")
    assert(got(3L) == want.take(2), s"truncated: ${got(3L)}")
    // sampled lumas actually track the frame content (decoded gray
    // levels shift only slightly under JPEG quantization)
    Seq(0, 2, 4).zipWithIndex.foreach { case (fi, oi) =>
      assert(math.abs(got(1L)(oi)._3.get - Seq(40, 80, 120, 160, 200)(fi))
        < 4.0)
    }
    // non-MJPEG AVI: byte-stride pseudo-frames, luma unmeasured
    assert(got(4L).nonEmpty && got(4L).forall(_._3.isEmpty))
    assert(got(4L).map(_._1) == (0 until got(4L).size))
  }

  test("AVI/MJPEG hostile bytes: corrupt headers fail the capability " +
      "probe; a lying in-movi chunk size ends the walk; an undecodable " +
      "frame chunk keeps its row with NULL luma") {
    val jpegs = Seq(60, 90).map(grayJpeg(8, 8, _))
    val good = mjpegAvi(jpegs, fps = 2, w = 8, h = 8)
    // header corruption: not an AVI / no vids stream
    assert(!Avi.isMjpegAvi(null))
    assert(!Avi.isMjpegAvi(Array.empty[Byte]))
    assert(!Avi.isMjpegAvi("RIFF1234WAVE".getBytes("US-ASCII")))
    assert(!Avi.isMjpegAvi(good.take(12))) // magic only, no hdrl
    // a frame chunk that lies about its size (runs past the payload):
    // the walk stops there — frames before it survive, nothing after
    val lying = {
      val b = good.clone()
      // find the SECOND '00dc' and blow up its size field
      def find(from: Int): Int = {
        var i = from
        while (i < b.length - 4 && !(b(i) == '0' && b(i + 1) == '0' &&
          b(i + 2) == 'd' && b(i + 3) == 'c')) i += 1
        i
      }
      val second = find(find(0) + 4)
      assert(second < b.length - 8)
      b(second + 4) = 0xff.toByte; b(second + 5) = 0xff.toByte
      b(second + 6) = 0xff.toByte; b(second + 7) = 0x0f.toByte
      b
    }
    val gotLying = Avi.sample(7L, lying, strideSec = 0.0).toSeq
    assert(gotLying.map(_.frame_idx) == Seq(0))
    assert(gotLying.head.mean_luma.contains(expectedLuma(jpegs.head)))
    // an undecodable frame payload (garbage, not JPEG): row kept, luma
    // NULL — container timing is real, measurement needs the codec
    val junkFrame = mjpegAvi(Seq(Array.fill[Byte](64)(3), jpegs(1)),
      fps = 2, w = 8, h = 8)
    val gotJunk = Avi.sample(8L, junkFrame, strideSec = 0.0).toSeq
    assert(gotJunk.map(f => (f.frame_idx, f.mean_luma.isDefined)) ==
      Seq((0, false), (1, true)))
  }

  test("AVI OpenDML: frames in appended RIFF-AVIX extension segments are " +
      "walked (full timeline, not first-RIFF-truncated); a corrupt " +
      "extension stops at the last whole segment") {
    val jpegs = Seq(40, 80, 120, 160, 200).map(grayJpeg(8, 8, _))
    // first RIFF holds 3 frames, but the header declares all 5 (OpenDML
    // files declare the legacy segment's count in avih; the real total
    // comes from walking the segments — our sampler indexes what it finds)
    val first = mjpegAvi(jpegs.take(3), fps = 2, w = 8, h = 8)
    def avix(frames: Seq[Array[Byte]]): Array[Byte] = {
      val movi = riffList("movi", frames.map(f => riffChunk("00dc", f)): _*)
      val payload = "AVIX".getBytes("US-ASCII") ++ movi
      "RIFF".getBytes("US-ASCII") ++ le32(movi.length + 4L) ++ payload
    }
    val openDml = first ++ avix(jpegs.slice(3, 5))
    assert(Avi.isMjpegAvi(openDml))
    val got = Avi.sample(9L, openDml, strideSec = 0.0).toSeq
    assert(got.map(_.frame_idx) == (0 until 5), s"frames: $got")
    got.zip(jpegs).foreach { case (f, j) =>
      assert(f.mean_luma.contains(expectedLuma(j)))
    }
    // two chained AVIX segments both contribute
    val twoSeg = first ++ avix(jpegs.slice(3, 4)) ++ avix(jpegs.slice(4, 5))
    assert(Avi.sample(10L, twoSeg, strideSec = 0.0).size == 5)
    // a truncated extension segment: frames before the cut survive, the
    // walk never runs past the payload
    val cut = openDml.dropRight(10)
    val gotCut = Avi.sample(11L, cut, strideSec = 0.0).toSeq
    assert(gotCut.map(_.frame_idx) == (0 until 4), s"cut: $gotCut")
    // garbage after the first RIFF is not an AVIX segment: ignored
    val junkTail = first ++ Array.fill[Byte](64)(7)
    assert(Avi.sample(12L, junkTail, strideSec = 0.0).size == 3)
  }

  test("hostile image header declaring multi-gigapixel dimensions is " +
      "rejected BEFORE raster allocation (never-crash contract: no OOM " +
      "escapes the decode)") {
    // a structurally valid PNG signature+IHDR declaring 60000x60000
    // (3.6 GP -> would be a ~14 GB INT_RGB raster)
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def hugePng(w: Long, h: Long): Array[Byte] = {
      val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
        .map(_.toByte)
      val ihdrData = be32(w) ++ be32(h) ++
        Array[Byte](8, 2, 0, 0, 0) // 8-bit RGB, default methods
      val body = "IHDR".getBytes("US-ASCII") ++ ihdrData
      val crc = new java.util.zip.CRC32()
      crc.update(body)
      sig ++ be32(13) ++ body ++ be32(crc.getValue)
    }
    val hostile = hugePng(60000, 60000)
    assert(Multimodal.safeRead(
      new java.io.ByteArrayInputStream(hostile)) == null)
    // decode path: row survives, marked undecodable
    val feat = Multimodal.decodeOne(5L, hostile)
    assert(!feat.decode_ok && feat.width.isEmpty)
    // resize path: null png, row survives
    val resized = Multimodal.resizeImages(
      Seq((5L, hostile)).toDF("asset_id", "payload"), 8, 8)
    assert(resized.filter(col("png").isNull).count() == 1)
    // a small real PNG still decodes through the capped reader
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val okFeat = Multimodal.decodeOne(6L, buf.toByteArray)
    assert(okFeat.decode_ok && okFeat.width.contains(4))
  }

  test("video frames: this container has no codec — the capability probe " +
      "is empty and the FAKE offsets path runs; a registered decoder " +
      "flips to the real path with no code change") {
    // capability probe: no VideoDecoder SPI on this classpath
    assert(Multimodal.videoDecoder().isEmpty)
    val assets = Seq((1L, Array.fill[Byte](130)(7))).toDF("asset_id", "payload")
    // FAKE path: byte-stride pseudo-frames, luma explicitly unmeasured
    val fake = Multimodal.videoFrameFeatures(assets, strideSec = 2.0)
      .as[VideoFrameFeatures].collect().sortBy(_.frame_idx)
    assert(fake.map(f => (f.frame_idx, f.ts_sec)).toSeq ==
      Seq((0, 0.0), (1, 2.0), (2, 4.0))) // 130 bytes / 64-stride = 3 frames
    assert(fake.forall(_.mean_luma.isEmpty))
    // injected decoder (standing in for an SPI registration): same
    // schema, real per-frame features
    val real = Multimodal.videoFrameFeatures(assets, strideSec = 2.0,
        decoder = Some(new ToyVideoDecoder))
      .as[VideoFrameFeatures].collect().sortBy(_.frame_idx)
    assert(real.map(f => (f.frame_idx, f.ts_sec, f.mean_luma)).toSeq ==
      Seq((0, 0.0, Some(100.0)), (1, 2.0, Some(101.0))))
  }
}

/** Deterministic stand-in for a real SPI video decoder (top-level so the
  * executor closure serializes cleanly).
  */
class ToyVideoDecoder extends VideoDecoder {
  override def sample(assetId: Long, payload: Array[Byte],
      strideSec: Double): Iterator[VideoFrameFeatures] =
    (0 until 2).iterator.map(i =>
      VideoFrameFeatures(assetId, i, i * strideSec, Some(100.0 + i)))
}
