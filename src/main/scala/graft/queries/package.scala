package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** A named engine query: the Spark plan plus (when SQL-expressible) the
    * equivalent ANSI SQL the DuckDB oracle runs on the same parquet tables.
    * Column names/types are aligned on both sides — the driver's compare
    * sorts columns by name before hashing.
    */
  final case class Q(
      run: (SparkSession, String) => DataFrame,
      oracle: Option[String],
      doc: String = "")
}
