package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.Row

import graft.SparkSpec

/** Edge cases the sf corpora don't cover: q81's bigram expression on docs
  * with 0/1 tokens must yield (n_bigrams=0, dup_bigram_ratio=NULL) exactly
  * like the DuckDB oracle's empty generate_series — not the descending
  * sequence(0,-1) artifact ([null,null] bigrams, ratio 0.5).
  */
class TextOpsEdgeSpec extends SparkSpec {

  test("q81_repetition: <=1-token docs give zero bigrams and NULL ratio") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val rows = Seq(
      Row(1L, "one", "en", "t", 3L),
      Row(2L, "", "en", "t", 0L),
      Row(3L, "two tokens here two tokens", "en", "t", 26L))
    val dir = Files.createTempDirectory("graft-q81").toString
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val q81 = Manifest.all.toMap.apply("q81_repetition")
    val out = q81.run(spark, dir)
      .orderBy("doc_id")
      .select("doc_id", "n_bigrams", "dup_bigram_ratio").collect()
    assert(out(0) === Row(1L, 0L, null))
    assert(out(1) === Row(2L, 0L, null))
    assert(out(2).getLong(1) === 4L)
    assert(out(2).getDouble(2) === 0.25)
  }
}
