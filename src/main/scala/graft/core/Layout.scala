package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Storage layout utilities for the 100 TB path (SURVEY.md §4 "partition
  * pruning" row): hive-partitioned parquet for pruning on
  * resourceType/date-style predicates, and bucketed tables for co-located
  * (shuffle-free) joins on stable business keys.
  */
object Layout {

  /** Write hive-partitioned parquet: queries filtering on `partitionCols`
    * prune directories at planning time (`PartitionFilters` in explain) —
    * scans touch only matching partitions, the difference between reading
    * 100 TB and reading one day of it.
    */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Save a bucketed table: joins/aggregations on `bucketCols` between
    * tables bucketed the same way need no exchange — the co-located-join
    * answer to "this shuffle becomes the bottleneck at 1000×".
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      bucketCols: Seq[String]): Unit = {
    // drop first: overwrite replaces a CATALOG-known table, but cannot
    // adopt a stale location left by a dropped/crashed writer
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
