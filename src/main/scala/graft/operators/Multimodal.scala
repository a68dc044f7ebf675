package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, flowing through real Spark schemas/partitioning.
  *
  * Two decode paths:
  *  - REAL codecs, all JDK-built-in, no external libraries:
  *    [[decodeImages]] / [[resizeImages]] via `javax.imageio`
  *    (PNG/JPEG/BMP/GIF — dims, channels, luma, 8×8 perceptual thumb,
  *    nearest-neighbor resize), [[decodeAudio]] via
  *    `javax.sound.sampled` (WAV/AIFF/AU PCM — rate, channels,
  *    duration, RMS, zero-crossing rate), [[imageDupPairs]] /
  *    [[aHash]] for perceptual image dedup on the decoded thumbs, and
  *    [[videoFrameFeatures]]' Y4M ([[Y4m]]) and AVI/Motion-JPEG
  *    ([[Avi]]) legs (container walk + per-frame decode, true frame
  *    timing). All partition-parallel typed maps.
  *  - [[extractFeatures]] / [[resizeStub]]: clearly-marked deterministic
  *    FAKEs for formats with no in-container codec (inter-frame video
  *    codecs): they derive
  *    "features" from the bytes arithmetically, so the pipeline shape
  *    (schema, batching, partition-parallel feature extraction) is real
  *    and testable while the codec call is swappable — and they stay
  *    DuckDB-oracle-able (q38/q63), which a real codec can never be.
  */
object Multimodal {

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta_source", StringType, nullable = true)))

  /** Wrap a text corpus as binary assets (the ingest shape: bytes + typed
    * metadata). In production the payload is the raw image/audio blob read
    * via `binaryFile` source; partitioning carries over from the source.
    */
  def ingestAsBinary(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      lit("application/octet-stream").as("media_type"),
      encode(col("text"), "UTF-8").as("payload"),
      col("source").as("meta_source"))

  /** The REAL media ingest leg: raw files read through Spark's
    * `binaryFile` source (each file = one row of path/length/bytes,
    * scanned partition-parallel — the same path a 100 TB image corpus
    * takes, with `pathGlobFilter` for format selection). Only the
    * downstream decode remains a stub; the source, schema, and
    * partitioning here are production-shaped.
    *
    * asset_id = [[Dedup.portableHash64]] of the file path: stable across
    * runs and cluster layouts (row order is not).
    */
  def readBinaryAssets(spark: SparkSession, dir: String,
      glob: String = "*", mediaType: String = "application/octet-stream"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        Dedup.portableHash64(col("path")).as("asset_id"),
        lit(mediaType).as("media_type"),
        col("content").as("payload"),
        col("path").as("meta_source"))

  /** FAKE decode + feature extraction (deterministic stand-in for an image
    * decode): byte length, leading byte, and arithmetic pseudo-dimensions.
    * Swap body for a real codec via mapPartitions when libs are available.
    */
  def extractFeatures(assets: DataFrame): DataFrame =
    assets.select(
      col("asset_id"),
      col("media_type"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      // FAKE-DECODE: pseudo width/height from payload size — placeholder for
      // a real `decode(payload).dimensions` call.
      (octet_length(col("payload")) % 640).cast("int").as("fake_width"),
      (octet_length(col("payload")) % 480).cast("int").as("fake_height"),
      ascii(decode(col("payload"), "UTF-8")).cast("int").as("first_byte"),
      col("meta_source"))

  /** FAKE resize: deterministic stand-in for an image resize — emits the
    * target dimensions plus a truncated-payload "thumbnail" (prefix bytes),
    * so downstream schema/partitioning and byte-budget accounting are real
    * while the interpolation kernel is swappable for a codec call.
    */
  def resizeStub(assets: DataFrame, width: Int, height: Int): DataFrame =
    assets.select(
      col("asset_id"),
      lit(width).as("target_width"),
      lit(height).as("target_height"),
      // FAKE-RESIZE: thumbnail = first width*height/64 payload bytes —
      // placeholder for `resize(decode(payload), width, height)`.
      substring(col("payload"), 1, width * height / 64).as("thumb"),
      octet_length(col("payload")).cast("long").as("orig_bytes"))

  /** REAL image decode via the JDK's built-in `javax.imageio` codecs
    * (PNG / JPEG / BMP / GIF — no external libraries, headless-safe):
    * per-asset width/height/channel-count plus an 8x8 grayscale
    * perceptual thumbnail (the aHash/dHash input — downstream near-dup
    * hashing runs on it without re-decoding). Undecodable or NULL
    * payloads yield `decode_ok = false` with NULL features — a poisoned
    * blob must mark its row, never kill the 100 TB job.
    *
    * Shape: typed `mapPartitions` over (id, payload) — codecs are
    * genuine per-row imperative logic (the survey's documented exception
    * to the expressions-first rule); decoding is partition-parallel, one
    * decoder loop per partition, nothing leaves the executor.
    */
  def decodeImages(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeOne(id, bytes) })
      .toDF()
  }

  /** Raster cap for any ImageIO decode in this module: 64 MP ≈ 256 MB of
    * INT_RGB raster — far above any legitimate corpus thumbnail, far below
    * executor heap. Without it a hostile header declaring 65500x65500
    * (JPEG's max) makes ImageIO allocate a multi-GB raster and die with
    * OutOfMemoryError, which no `catch Exception` recovers — against the
    * hostile-bytes never-crash contract.
    */
  private[operators] val MaxDecodePixels: Long = 64L * 1024 * 1024

  /** ImageIO.read with the declared-dimension pre-check: the header's
    * width/height are read BEFORE the raster is allocated (the Y4m parser's
    * dimension sanity check, applied to the SPI codec path). Returns null
    * for no-codec / undecodable / over-cap payloads — callers already
    * treat null as decode failure.
    */
  private[operators] def safeRead(
      in: java.io.InputStream): java.awt.image.BufferedImage =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(in)
      if (iis == null) return null
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return null
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          val w = reader.getWidth(0).toLong
          val h = reader.getHeight(0).toLong
          if (w <= 0 || h <= 0 || w * h > MaxDecodePixels) null
          else reader.read(0)
        } finally reader.dispose()
      } finally iis.close()
    } catch { case _: Exception => null }

  /** One asset through ImageIO: dimensions, channel count, mean luma
    * (0-255 integer BT.601 over the 8x8 thumb), and the 8x8 grayscale
    * thumbnail in row-major order (box-averaged — decoder-stable, no
    * Graphics2D interpolation variance across JVMs). Pure function of
    * the bytes — deterministic across partitionings and cluster layouts.
    */
  private[operators] def decodeOne(id: Long,
      bytes: Array[Byte]): ImageFeatures = {
    val img =
      if (bytes == null || bytes.isEmpty) null
      else safeRead(new java.io.ByteArrayInputStream(bytes))
    if (img == null) ImageFeatures(id, decode_ok = false,
      None, None, None, None, None)
    else {
      val w = img.getWidth; val h = img.getHeight
      val thumb = new Array[Int](64)
      var ty = 0
      while (ty < 8) {
        var tx = 0
        while (tx < 8) {
          val x0 = tx * w / 8; val x1 = math.max((tx + 1) * w / 8, x0 + 1)
          val y0 = ty * h / 8; val y1 = math.max((ty + 1) * h / 8, y0 + 1)
          var sum = 0L; var n = 0
          var y = y0
          while (y < h && y < y1) {
            var x = x0
            while (x < w && x < x1) {
              val rgb = img.getRGB(x, y)
              val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff
              val b = rgb & 0xff
              sum += (299 * r + 587 * g + 114 * b) / 1000 // BT.601 int luma
              n += 1
              x += 1
            }
            y += 1
          }
          thumb(ty * 8 + tx) = if (n == 0) 0 else (sum / n).toInt
          tx += 1
        }
        ty += 1
      }
      ImageFeatures(id, decode_ok = true, Some(w), Some(h),
        Some(img.getColorModel.getNumComponents),
        Some(thumb.sum.toDouble / 64.0), Some(thumb.toSeq))
    }
  }

  /** REAL image resize through the same JDK codec path: decode, nearest-
    * neighbor scale to `width` x `height` (deterministic — no AA kernel
    * variance), re-encode as PNG. Undecodable payloads pass through with
    * a NULL png. Partition-parallel typed map, nothing leaves the
    * executor.
    */
  def resizeImages(assets: DataFrame, width: Int,
      height: Int): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    require(width > 0 && height > 0, "resizeImages: target dims must be > 0")
    assets.select(col("asset_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val img =
          if (bytes == null || bytes.isEmpty) null
          else safeRead(new java.io.ByteArrayInputStream(bytes))
        if (img == null) ResizedImage(id, width, height, None)
        else {
          val out = new java.awt.image.BufferedImage(width, height,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < height) {
            var x = 0
            while (x < width) {
              out.setRGB(x, y, img.getRGB(
                x * img.getWidth / width, y * img.getHeight / height))
              x += 1
            }
            y += 1
          }
          val buf = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", buf)
          ResizedImage(id, width, height, Some(buf.toByteArray))
        }
      })
      .toDF()
  }

  /** Perceptual aHash from [[decodeImages]]' 8x8 thumb: bit i set when
    * thumb(i) >= the thumb's own mean — 64 bits packed into one long.
    * Column-level (composes into any projection); NULL thumb -> NULL
    * hash. The standard re-encode-robust image fingerprint: byte-level
    * dedup misses a recompressed JPEG, the luma thumb doesn't.
    */
  def aHash(thumb8: Column): Column =
    // fused codegen'd loop (r13): the composed spelling below is THREE
    // interpreted HigherOrderFunctions per thumb; see
    // [[graft.functions.AHash64Expr]] — `AHash64Spec` pins row identity
    org.apache.spark.sql.graftbridge.ExprBridge.column(
      graft.functions.AHash64Expr(
        org.apache.spark.sql.graftbridge.ExprBridge.expr(thumb8)))

  /** The composed-builtin spelling of [[aHash]] — the property-test
    * oracle for the fused expression (never used in a hot path).
    */
  private[graft] def aHashComposed(thumb8: Column): Column = {
    // mean comparison in pure integers (v*64 >= total) — no float parity
    // hazards; element i -> bit i, packed as two 32-bit halves folded
    // MSB-first (an ANSI-mode long would overflow-throw on the top bit
    // of a single 64-bit arithmetic fold; shiftleft is bitwise, not
    // arithmetic)
    val total = aggregate(thumb8, lit(0L), (acc, x) => acc + x)
    val bits = transform(thumb8,
      v => when(v * 64L >= total, lit(1L)).otherwise(lit(0L)))
    def pack32(sl: Column): Column =
      aggregate(reverse(sl), lit(0L), (acc, b) => acc * 2 + b)
    when(thumb8.isNull, lit(null).cast("long"))
      .otherwise(shiftleft(pack32(slice(bits, 33, 32)), 32)
        .bitwiseOR(pack32(slice(bits, 1, 32))))
  }

  /** Image near-dup pairs by aHash Hamming distance <= `maxBits` over
    * decoded assets: 4x16-bit pigeonhole bands (a pair within 3 bits
    * MUST agree on >= 1 band — the [[Dedup.simhashPairs]] construction),
    * so candidate generation is a band equi-join, never all-pairs;
    * verification is one XOR+popcount per candidate. Scale shape
    * mirrors simhash: map-side hash, (band, bits) shuffle, candidate-
    * only verify.
    */
  def imageDupPairs(decoded: DataFrame, maxBits: Int = 3): DataFrame = {
    // materialized once: BOTH self-join sides consume the hashed
    // relation, and without the checkpoint each side re-runs the decode
    // (a real codec on the production path) and the interpreted aHash
    // fold. 16 bytes per asset — tiny next to the assets it indexes.
    val hashed = decoded.filter(col("decode_ok"))
      .select(col("asset_id"), aHash(col("thumb8")).as("h"))
      .localCheckpoint(true)
    val banded = hashed.select(col("asset_id"), col("h"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            shiftrightunsigned(col("h"), b * 16)
              .bitwiseAND(lit(0xffffL)).as("bits"))): _*)).as("bb"))
      .select(col("asset_id"), col("h"),
        col("bb.band").as("band"), col("bb.bits").as("bits"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bits") === col("b.bits") &&
          col("a.asset_id") < col("b.asset_id"))
      .select(col("a.asset_id").as("asset_a"),
        col("b.asset_id").as("asset_b"),
        bit_count(col("a.h").bitwiseXOR(col("b.h"))).as("dist"))
      .filter(col("dist") <= maxBits)
      .distinct()
  }

  /** REAL audio decode via the JDK's built-in `javax.sound.sampled`
    * (WAV/AIFF/AU PCM — no external libraries): per-asset sample rate,
    * channel count, frame count, duration, and signal features (RMS
    * energy and zero-crossing rate over the first channel) — the
    * quality/silence filters an audio corpus pipeline gates on.
    * Undecodable or NULL payloads flag their row (`decode_ok = false`),
    * never kill the job. Partition-parallel typed map.
    */
  def decodeAudio(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeAudioOne(id, bytes) })
      .toDF()
  }

  private[operators] def decodeAudioOne(id: Long,
      bytes: Array[Byte]): AudioFeatures = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val in =
      if (bytes == null || bytes.isEmpty) null
      else
        try AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        catch { case _: Exception => null }
    if (in == null)
      AudioFeatures(id, decode_ok = false, features_ok = false,
        None, None, None, None, None, None)
    else
      try {
        val fmt = in.getFormat
        val pcmSigned = fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED
        val bytesPerSample = fmt.getSampleSizeInBits / 8
        val frames = in.getFrameLength
        val rate = fmt.getSampleRate.toDouble
        val ch = fmt.getChannels
        if (!pcmSigned || (bytesPerSample != 2 && bytesPerSample != 1))
          // container metadata decoded fine, but the sample loop below
          // only measures 8/16-bit signed PCM — features_ok = false is
          // the DISTINCT flag a silence filter must key on: a filter
          // keyed on `rms IS NULL OR rms < eps` would silently drop
          // 24/32-bit and float assets as "silent" when they were merely
          // unmeasured
          AudioFeatures(id, decode_ok = true, features_ok = false,
            Some(rate), Some(ch), Some(frames), Some(frames / rate),
            None, None)
        else {
          // first channel, full read: 16-bit or 8-bit signed PCM
          val data = in.readAllBytes()
          val frameBytes = fmt.getFrameSize
          val n = data.length / frameBytes
          var i = 0; var sumSq = 0.0; var zc = 0L; var prevNeg = false
          while (i < n) {
            val off = i * frameBytes
            val s =
              if (bytesPerSample == 2) {
                // one sample from the (lo, hi) pair per endianness
                val b0 = data(off); val b1 = data(off + 1)
                val s16 =
                  if (fmt.isBigEndian) ((b0 << 8) | (b1 & 0xff)).toShort
                  else ((b1 << 8) | (b0 & 0xff)).toShort
                s16 / 32768.0
              } else data(off) / 128.0
            sumSq += s * s
            val neg = s < 0
            if (i > 0 && neg != prevNeg) zc += 1
            prevNeg = neg
            i += 1
          }
          val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n)
          val zcr = if (n <= 1) 0.0 else zc.toDouble / (n - 1)
          AudioFeatures(id, decode_ok = true, features_ok = true,
            Some(rate), Some(ch), Some(n.toLong), Some(n / rate),
            Some(math.rint(rms * 1e6) / 1e6), Some(math.rint(zcr * 1e6) / 1e6))
        }
      } catch {
        case _: Exception =>
          AudioFeatures(id, decode_ok = false, features_ok = false,
            None, None, None, None, None, None)
      } finally in.close()
  }

  /** Frame-sampling shape: one row per sampled offset (stride over bytes,
    * standing in for video frame indices) — demonstrates the explode-style
    * fan-out a frame sampler produces, with deterministic offsets.
    */
  def sampleFrames(assets: DataFrame, stride: Int = 64): DataFrame =
    // NULL payload = 0 bytes, PINNED: `greatest(NULL-1, 0)` is 0 on both
    // engines (greatest skips NULLs), so a NULL asset already emits its
    // offset-0 row — the length must agree and be 0, not NULL (Spark's
    // least() would skip the NULL and claim a full stride)
    assets.select(col("asset_id"),
        coalesce(octet_length(col("payload")), lit(0)).as("__n_bytes"),
        explode(sequence(lit(0),
          greatest(octet_length(col("payload")) - 1, lit(0)),
          lit(stride))).as("frame_offset"))
      // the tail frame is CLAMPED to the remaining payload (an asset is
      // rarely an exact multiple of the stride); interior frames are full
      .withColumn("frame_len",
        least(lit(stride), col("__n_bytes") - col("frame_offset"))
          .cast("int"))
      .drop("__n_bytes")

  /** Runtime video-codec capability probe: the JDK ships no video API, so
    * a real frame extractor arrives (if ever) as a [[VideoDecoder]] SPI
    * implementation on the classpath
    * (`META-INF/services/graft.operators.VideoDecoder`). Probing at
    * runtime means a codec-enabled container flips
    * [[videoFrameFeatures]] to the real path with NO code change here —
    * this container has none, so the arithmetic FAKE keeps backing the
    * oracle-able q38/q63 shapes.
    */
  def videoDecoder(): Option[VideoDecoder] = {
    val it = java.util.ServiceLoader.load(classOf[VideoDecoder]).iterator()
    if (it.hasNext) Some(it.next()) else None
  }

  /** Per-asset format-dispatched per-frame features (partition-parallel
    * typed map — the [[decodeImages]] shape; one output row per sampled
    * frame, one shared schema for every path):
    *
    *  - YUV4MPEG2 payloads take the REAL pure-JDK decode path
    *    ([[Y4m]]): header + FRAME parsing, true frame timing from the
    *    stream's F rate, mean luma measured from each sampled frame's Y
    *    plane. No native codec involved — Y4M is uncompressed.
    *  - AVI containers whose video stream is Motion-JPEG take the REAL
    *    pure-JDK path ([[Avi]]): RIFF chunk walk for frames + timing,
    *    `javax.imageio` JPEG decode per sampled frame. AVIs carrying a
    *    true inter-frame codec (H.264 etc.) deliberately do NOT match —
    *    they fall through to the SPI/FAKE path below.
    *  - Other containers go to a registered [[VideoDecoder]] SPI
    *    implementation when one exists ([[videoDecoder]] probe).
    *  - Otherwise the deterministic FAKE: one pseudo-frame per 64-byte
    *    stride (the [[sampleFrames]] offsets), luma explicitly
    *    unmeasured → NULL — schema-real plumbing for codec-requiring
    *    formats this container cannot decode.
    *
    * `decoder` is injectable for tests — production callers take the
    * probed default.
    */
  def videoFrameFeatures(assets: DataFrame, strideSec: Double = 1.0,
      decoder: Option[VideoDecoder] = videoDecoder()): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        if (Y4m.isY4m(bytes)) Y4m.sample(id, bytes, strideSec)
        else if (Avi.isMjpegAvi(bytes)) Avi.sample(id, bytes, strideSec)
        else decoder match {
          case Some(d) => d.sample(id, bytes, strideSec)
          case None => fakeFrames(id, bytes, strideSec)
        }
      })
      .toDF()
  }

  /** The FAKE pseudo-frame rows, bit-equal to the pre-r9 declarative
    * spelling: offsets 0, 64, … over max(len−1, 0) (a NULL/empty payload
    * still emits its offset-0 row — the [[sampleFrames]] contract),
    * ts as if sampled at `strideSec`, luma NULL.
    */
  private def fakeFrames(id: Long, bytes: Array[Byte],
      strideSec: Double): Iterator[VideoFrameFeatures] = {
    val n = if (bytes == null) 0 else bytes.length
    val last = math.max(n - 1, 0)
    (0 to last by 64).iterator.zipWithIndex.map { case (_, idx) =>
      VideoFrameFeatures(id, idx, idx * strideSec, None)
    }
  }
}

/** Pure-JDK YUV4MPEG2 (Y4M) frame sampler — the one video container that
  * needs NO codec: frames are raw planar YUV behind a text header, so
  * parsing is arithmetic (public format; layout per the mjpegtools
  * yuv4mpeg(5) description). Supported colorspaces: C420 (any variant
  * suffix — jpeg/paldv/mpeg2 differ only in chroma SITING, not plane
  * sizes), C422, C444, Cmono; default when absent is C420. Frame rate
  * `Fnum:den` drives REAL timing: one frame sampled every `strideSec`
  * seconds (step = max(1, round(strideSec·num/den)) frames), `ts_sec` =
  * idx·den/num; a missing F falls back to 25:1. `mean_luma` is the raw
  * Y-plane byte mean (0–255, 6dp) of the sampled frame.
  *
  * Robustness contract (spec-gated): a malformed header, unsupported
  * colorspace, or nonsense geometry yields ZERO rows (a real decoder's
  * behavior on a corrupt container — never a crash); a TRUNCATED stream
  * yields its complete frames and stops.
  */
private[graft] object Y4m {
  private val Magic = "YUV4MPEG2".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  def isY4m(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length > Magic.length &&
      java.util.Arrays.equals(bytes, 0, Magic.length, Magic, 0, Magic.length)

  /** Plane-size factor ×4: 420 → 6/4, 422 → 8/4, 444 → 12/4, mono → 4/4. */
  private def frameBytesX4(cs: String): Option[Long] = cs match {
    case s if s.startsWith("420") => Some(6L)
    case s if s.startsWith("422") => Some(8L)
    case s if s.startsWith("444") && !s.startsWith("444alpha") => Some(12L)
    case s if s.startsWith("mono") => Some(4L)
    case _ => None
  }

  def sample(assetId: Long, bytes: Array[Byte],
      strideSec: Double): Iterator[VideoFrameFeatures] = {
    val nl = bytes.indexOf('\n'.toByte)
    if (nl < 0) return Iterator.empty
    val header = new String(bytes, 0, nl,
      java.nio.charset.StandardCharsets.US_ASCII)
    val tags = header.split(' ').drop(1)
    def tag(c: Char): Option[String] =
      tags.collectFirst { case t if t.nonEmpty && t.head == c => t.tail }
    val (w, h) = try {
      (tag('W').map(_.toInt).getOrElse(-1), tag('H').map(_.toInt).getOrElse(-1))
    } catch { case _: NumberFormatException => return Iterator.empty }
    // geometry sanity: positive, even dims for subsampled chroma, and a
    // frame that fits memory arithmetic (the byte array bounds it anyway)
    if (w <= 0 || h <= 0 || w.toLong * h > Int.MaxValue / 4)
      return Iterator.empty
    val (fNum, fDen) = tag('F') match {
      case Some(f) => f.split(':') match {
        case Array(n, d) =>
          try {
            val (ni, di) = (n.toLong, d.toLong)
            if (ni <= 0 || di <= 0) return Iterator.empty
            (ni, di)
          } catch { case _: NumberFormatException => return Iterator.empty }
        case _ => return Iterator.empty
      }
      case None => (25L, 1L)
    }
    val cs = tag('C').getOrElse("420")
    val fbX4 = frameBytesX4(cs) match {
      case Some(x) => x
      case None => return Iterator.empty
    }
    if ((fbX4 == 6L || fbX4 == 8L) && (w % 2 != 0 || (fbX4 == 6L && h % 2 != 0)))
      return Iterator.empty
    val frameBytes = (w.toLong * h * fbX4 / 4).toInt
    val ySize = w * h
    val step = math.max(1L,
      math.round(strideSec * fNum.toDouble / fDen.toDouble))
    new Iterator[VideoFrameFeatures] {
      private var pos = nl + 1
      private var idx = 0L
      private var nextFrame: VideoFrameFeatures = _
      private def advance(): Unit = {
        nextFrame = null
        while (nextFrame == null && pos < bytes.length) {
          // FRAME marker line (optional params up to \n)
          val lineEnd = {
            var i = pos
            while (i < bytes.length && bytes(i) != '\n'.toByte) i += 1
            i
          }
          if (lineEnd >= bytes.length ||
              lineEnd - pos < 5 ||
              !(bytes(pos) == 'F' && bytes(pos + 1) == 'R' &&
                bytes(pos + 2) == 'A' && bytes(pos + 3) == 'M' &&
                bytes(pos + 4) == 'E')) {
            pos = bytes.length // malformed/truncated marker: stop
          } else {
            val dataStart = lineEnd + 1
            if (dataStart + frameBytes > bytes.length) {
              pos = bytes.length // truncated frame: stop
            } else {
              if (idx % step == 0) {
                var s = 0L
                var i = 0
                while (i < ySize) {
                  s += bytes(dataStart + i) & 0xff
                  i += 1
                }
                val luma = math.rint(s.toDouble / ySize * 1e6) / 1e6
                nextFrame = VideoFrameFeatures(assetId, idx.toInt,
                  idx * fDen.toDouble / fNum.toDouble, Some(luma))
              }
              idx += 1
              pos = dataStart + frameBytes
            }
          }
        }
      }
      advance()
      override def hasNext: Boolean = nextFrame != null
      override def next(): VideoFrameFeatures = {
        val f = nextFrame; advance(); f
      }
    }
  }
}

/** Pure-JDK AVI/Motion-JPEG frame sampler — the second REAL video path
  * (after [[Y4m]]): the AVI container is a plain RIFF chunk tree (public
  * format; layout per Microsoft's AVI RIFF / OpenDML description), and
  * Motion-JPEG frames are ordinary baseline JPEGs the JDK's built-in
  * ImageIO codec decodes — so the most common "box of stills" video
  * container needs NO native codec. Dispatch is capability-honest:
  * [[isMjpegAvi]] matches only when the header declares a 'vids' stream
  * with an MJPG-family handler (MJPG/MJPA/dmb1, any case); an AVI
  * carrying a true inter-frame codec never reaches this sampler and
  * keeps the SPI/FAKE path.
  *
  * Timing is real: fps = strh dwRate/dwScale (falling back to avih
  * dwMicroSecPerFrame, then 25); `frame_idx` counts the vids stream's
  * frame chunks ('NNdc'/'NNdb' for its stream number, including inside
  * nested 'rec ' lists); one frame sampled every `strideSec` seconds,
  * `ts_sec` = idx/fps. `mean_luma` is the whole-frame integer-BT.601
  * mean of the ImageIO-decoded JPEG at 6dp (the [[Y4m]] convention); a
  * frame chunk ImageIO cannot decode (a DHT-less camera JPEG, a raw-DIB
  * '00db' chunk) keeps its row with NULL luma — frame existence and
  * timing come from the container, measurement from the codec (the
  * [[AudioFeatures]] `features_ok` philosophy).
  *
  * Robustness contract (spec-gated, mirroring [[Y4m]]): a chunk whose
  * declared size runs past the payload ends the walk at the last whole
  * chunk (truncated upload → complete frames only); malformed headers
  * fail [[isMjpegAvi]], so the asset falls to the non-real paths rather
  * than crashing the job.
  */
private[graft] object Avi {
  private val MjpgHandlers = Set("MJPG", "MJPA", "DMB1")

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def cc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** First 'vids' stream: its stream number (frame chunks are
    * '%02d'+dc/db of it), handler fourcc, strh scale/rate, avih
    * micro-sec-per-frame fallback.
    */
  private case class Vids(streamIdx: Int, handler: String, scale: Long,
      rate: Long, microPerFrame: Long)

  private def header(bytes: Array[Byte]): Option[Vids] = {
    if (bytes == null || bytes.length < 12 || cc(bytes, 0) != "RIFF" ||
        cc(bytes, 8) != "AVI ") return None
    val end = math.min(bytes.length.toLong, 8L + u32(bytes, 4)).toInt
    var pos = 12
    var out: Option[Vids] = None
    while (out.isEmpty && pos + 8 <= end) {
      val sz = u32(bytes, pos + 4)
      val dStart = pos + 8
      if (cc(bytes, pos) == "LIST" && sz >= 4 && dStart + 4 <= end &&
          cc(bytes, dStart) == "hdrl")
        out = scanHdrl(bytes, dStart + 4,
          math.min(dStart.toLong + sz, end.toLong).toInt)
      val np = (dStart.toLong + sz + (sz & 1)).toInt
      pos = if (np <= pos) end else np // 4 GiB-size overflow guard
    }
    out
  }

  private def scanHdrl(bytes: Array[Byte], from: Int,
      to: Int): Option[Vids] = {
    var p = from
    var micro = 0L
    var streamIdx = -1
    var vids: Option[(Int, String, Long, Long)] = None
    while (p + 8 <= to) {
      val id = cc(bytes, p)
      val sz = u32(bytes, p + 4)
      val dStart = p + 8
      val dEnd = math.min(dStart.toLong + sz, to.toLong).toInt
      if (id == "avih" && sz >= 4 && dStart + 4 <= to)
        micro = u32(bytes, dStart)
      else if (id == "LIST" && sz >= 4 && dStart + 4 <= to &&
          cc(bytes, dStart) == "strl") {
        streamIdx += 1 // stream number = position of its strl in hdrl
        var q = dStart + 4
        while (q + 8 <= dEnd) {
          val ssz = u32(bytes, q + 4)
          // strh data: fccType@0, fccHandler@4, dwScale@20, dwRate@24
          if (cc(bytes, q) == "strh" && ssz >= 28 && q + 36 <= dEnd &&
              cc(bytes, q + 8) == "vids" && vids.isEmpty)
            vids = Some((streamIdx, cc(bytes, q + 12),
              u32(bytes, q + 28), u32(bytes, q + 32)))
          val nq = (q + 8L + ssz + (ssz & 1)).toInt
          q = if (nq <= q) dEnd else nq
        }
      }
      val np = (dStart.toLong + sz + (sz & 1)).toInt
      p = if (np <= p) to else np
    }
    vids.map { case (i, hnd, sc, rt) => Vids(i, hnd, sc, rt, micro) }
  }

  def isMjpegAvi(bytes: Array[Byte]): Boolean =
    header(bytes).exists(v => MjpgHandlers.contains(v.handler.toUpperCase))

  def sample(assetId: Long, bytes: Array[Byte],
      strideSec: Double): Iterator[VideoFrameFeatures] =
    header(bytes) match {
      case None => Iterator.empty
      case Some(v) =>
        val fps =
          if (v.scale > 0 && v.rate > 0) v.rate.toDouble / v.scale
          else if (v.microPerFrame > 0) 1e6 / v.microPerFrame
          else 25.0
        val step = math.max(1L, math.round(strideSec * fps))
        val pre = f"${v.streamIdx}%02d"
        val wantDc = pre + "dc"
        val wantDb = pre + "db"
        val end = math.min(bytes.length.toLong, 8L + u32(bytes, 4)).toInt
        val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
        // collect the vids stream's whole frame chunks; stop at the
        // first chunk whose declared extent runs past the payload
        def walk(from: Int, to: Int): Unit = {
          var p = from
          var done = false
          while (!done && p + 8 <= to) {
            val id = cc(bytes, p)
            val sz = u32(bytes, p + 4)
            val dStart = p + 8
            val dEnd = dStart.toLong + sz
            val lt =
              if (id == "LIST" && sz >= 4 && dStart + 4 <= to)
                cc(bytes, dStart)
              else ""
            if (lt == "movi" || lt == "rec ")
              walk(dStart + 4, math.min(dEnd, to.toLong).toInt)
            else if (dEnd <= to && (id == wantDc || id == wantDb))
              frames += ((dStart, sz.toInt))
            if (dEnd + (sz & 1) > to) done = true // truncated: stop
            else p = (dEnd + (sz & 1)).toInt
          }
        }
        walk(12, end)
        // OpenDML (AVI 2.0): files >1 GB continue as appended
        // `RIFF <size> AVIX` segments, each holding its own movi list.
        // Walking them keeps the frame count/timeline capability-honest —
        // the first-RIFF-only walk silently reported a truncated file as
        // complete. A malformed extension header stops the walk at the
        // last whole segment (the Y4m truncation convention).
        var seg = end
        var more = true
        while (more && seg + 12 <= bytes.length) {
          if (cc(bytes, seg) == "RIFF" && cc(bytes, seg + 8) == "AVIX") {
            val segSz = u32(bytes, seg + 4)
            val segEnd =
              math.min(bytes.length.toLong, seg + 8L + segSz).toInt
            walk(seg + 12, segEnd)
            val next = (seg + 8L + segSz + (segSz & 1)).toInt
            if (next <= seg) more = false else seg = next
          } else more = false
        }
        frames.iterator.zipWithIndex.collect {
          case ((off, len), idx) if idx % step == 0 =>
            VideoFrameFeatures(assetId, idx, idx / fps,
              jpegMeanLuma(bytes, off, len))
        }
    }

  /** Whole-frame mean of integer BT.601 luma at 6dp — [[Y4m]]'s
    * convention on the decoded pixels; None when ImageIO can't decode
    * the chunk (frame row survives with unmeasured luma).
    */
  private def jpegMeanLuma(bytes: Array[Byte], off: Int,
      len: Int): Option[Double] = {
    if (len <= 0) return None
    val img = Multimodal.safeRead(
      new java.io.ByteArrayInputStream(bytes, off, len))
    if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      var s = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff
          val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          s += (299 * r + 587 * g + 114 * b) / 1000
          x += 1
        }
        y += 1
      }
      Some(math.rint(s.toDouble / (w.toLong * h) * 1e6) / 1e6)
    }
  }
}

/** SPI for a real video frame sampler: a codec-enabled deployment
  * registers an implementation via `java.util.ServiceLoader` and
  * [[Multimodal.videoFrameFeatures]] dispatches to it at runtime.
  * Implementations must be deterministic functions of the bytes
  * (partitioning-independence is the corpus-wide contract) and
  * serializable (they ride the closure to executors).
  */
trait VideoDecoder extends Serializable {
  /** Sample ~one frame every `strideSec` seconds of `payload`. */
  def sample(assetId: Long, payload: Array[Byte],
      strideSec: Double): Iterator[VideoFrameFeatures]
}

/** One sampled video frame's features ([[Multimodal.videoFrameFeatures]] —
  * both the real SPI path and the FAKE emit this schema).
  */
case class VideoFrameFeatures(asset_id: Long, frame_idx: Int,
    ts_sec: Double, mean_luma: Option[Double])

/** Typed decode output of [[Multimodal.decodeImages]]. */
case class ImageFeatures(asset_id: Long, decode_ok: Boolean,
    width: Option[Int], height: Option[Int], n_channels: Option[Int],
    mean_luma: Option[Double], thumb8: Option[Seq[Int]])

/** Typed output of [[Multimodal.resizeImages]]. */
case class ResizedImage(asset_id: Long, target_width: Int,
    target_height: Int, png: Option[Array[Byte]])

/** Typed output of [[Multimodal.decodeAudio]]. `decode_ok` = the
  * container/format decoded; `features_ok` = rms/zcr were actually
  * measured (8/16-bit signed PCM) — decodable-but-unmeasured encodings
  * (24/32-bit, float, unsigned) carry `decode_ok = true,
  * features_ok = false` so a silence filter can distinguish "quiet"
  * from "unmeasured".
  */
case class AudioFeatures(asset_id: Long, decode_ok: Boolean,
    features_ok: Boolean,
    sample_rate: Option[Double], n_channels: Option[Int],
    n_frames: Option[Long], duration_sec: Option[Double],
    rms: Option[Double], zcr: Option[Double])
