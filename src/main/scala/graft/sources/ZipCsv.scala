package graft.sources

import java.util.zip.ZipInputStream

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.types.StructType

/** S1 — distributed ZIP+CSV source (dags/ODSImport.py:77-100: GET zip →
  * open member csv → headerless positional parse).
  *
  * The reference unzips driver-side with pandas; this source unzips in
  * executors via `binaryFiles` + flatMap, so a directory of zip archives
  * (the 100 TB shape: one archive per publication cycle) fans out across
  * the cluster — one task per archive, lines parsed by Spark's CSV reader
  * with the explicit positional schema. The HTTP fetch stays outside the
  * plan (download to storage, then scan), mirroring the
  * fetch-then-load split the reference uses.
  */
object ZipCsv {

  /** Read `memberSuffix`-matching members of every zip under `path` into a
    * DataFrame with the given headerless schema.
    */
  def read(spark: SparkSession, path: String, schema: StructType,
      memberSuffix: String = ".csv"): DataFrame = {
    val lines = spark.sparkContext.binaryFiles(path).flatMap {
      case (_, stream) =>
        val zis = new ZipInputStream(stream.open())
        val out = ArrayBuffer.empty[String]
        try {
          var entry = zis.getNextEntry
          while (entry != null) {
            if (!entry.isDirectory && entry.getName.endsWith(memberSuffix)) {
              // materialize the member's lines before advancing the entry —
              // ZipInputStream invalidates the stream on getNextEntry
              val reader = new java.io.BufferedReader(
                new java.io.InputStreamReader(zis, "UTF-8"))
              var line = reader.readLine()
              while (line != null) { out += line; line = reader.readLine() }
            }
            entry = zis.getNextEntry
          }
        } finally zis.close()
        out.iterator
    }
    implicit val enc: Encoder[String] = Encoders.STRING
    // escape='"' = RFC4180 doubled-quote escaping, pandas read_csv's
    // default (doublequote=True) and therefore the reference's semantics
    // (dags/ODSImport.py:100). Spark's own default escape is backslash,
    // under which `""` inside a quoted field falls to univocity's
    // STOP_AT_DELIMITER raw-field fallback — a silent divergence from
    // the reference caught by the r11 DSv2 parity spec.
    spark.read.schema(schema).option("header", "false")
      .option("escape", "\"")
      .csv(spark.createDataset(lines))
  }
}
