package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed + partitioned table layout — the two 100 TB locality tools
  * Spark offers at the STORAGE layer, complementing the per-query shapes
  * the operators choose:
  *
  *  - '''Bucketing''' pre-hashes a table into a fixed number of files per
  *    partition by a key at WRITE time. Every later equi-join or
  *    aggregation on that key reads the layout instead of shuffling: two
  *    tables bucketed on the same key with the same bucket count join
  *    with ZERO Exchange on either side — at corpus scale that deletes
  *    the single most expensive stage (re-shuffling 100 TB) from every
  *    recurring join against the corpus (dedup index refresh, embedding
  *    joins, incremental batch-vs-base). Buckets also bound task input:
  *    one task reads one bucket's files.
  *  - '''Partitioning''' (directory-level) prunes whole directories at
  *    planning time: a filter on the partition column never reads, lists,
  *    or schedules the other partitions (`PartitionFilters` in the scan,
  *    gated in `BucketedSpec`).
  *
  * Bucketed tables must go through the session catalog (`saveAsTable`) —
  * the bucket spec lives in table metadata, not the files; a plain
  * `.parquet(path)` write silently drops it. `BucketedSpec` gates the
  * zero-exchange join and bucketed-aggregate plans so a refactor that
  * breaks the layout contract fails CI.
  */
object Bucketed {

  /** Write `df` as a bucketed (and optionally directory-partitioned)
    * managed parquet table. `sortCols` defaults to the bucket key so
    * within-bucket files arrive sorted — sort-merge joins then skip the
    * per-task sort as well (the fully exchange-free AND sort-free join).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int, partitionCols: Seq[String] = Nil,
      sortCols: Seq[String] = Nil): Unit = {
    require(nBuckets >= 1, s"writeBucketed: nBuckets must be >= 1, got $nBuckets")
    // drop first: overwrite replaces a CATALOG-known table, but cannot
    // adopt a stale location left by a dropped/crashed writer
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    val sorted = if (sortCols.isEmpty) Seq(bucketCol) else sortCols
    val w0 = df.write.mode("overwrite").format("parquet")
    val w1 = if (partitionCols.nonEmpty)
      w0.partitionBy(partitionCols: _*) else w0
    w1.bucketBy(nBuckets, bucketCol)
      .sortBy(sorted.head, sorted.tail: _*)
      .saveAsTable(table)
  }

  /** Write `df` directory-partitioned (no bucketing) — for low-cardinality
    * routing columns (language, source, shard) where planning-time pruning
    * is the win and per-key file counts stay manageable.
    */
  def writePartitioned(df: DataFrame, table: String,
      partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "writePartitioned: need partition columns")
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    df.write.mode("overwrite").format("parquet")
      .partitionBy(partitionCols: _*).saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
