package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, flowing through real Spark schemas/partitioning. The decode
  * step is a clearly-marked deterministic FAKE (image/audio codecs are not
  * in this container — see builder prompt): it derives "features" from the
  * bytes arithmetically, so the pipeline shape (schema, batching,
  * partition-parallel feature extraction) is real and testable while the
  * codec call is swappable.
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
}
