package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("vocabCoverage: deterministic order, exact counts, cumulative " +
      "share reaches the top-v prefix mass") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat"),
      (3L, null.asInstanceOf[String]),
      (4L, "   ")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.vocabCoverage(docs, col("text"), v = 3)
      .as[(Long, String, Long, Double)].collect()
    // 9 occurrences: the×3, sat×2, cat/on/mat/dog ×1
    assert(got.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((1L, "the", 3L), (2L, "sat", 2L), (3L, "cat", 1L)))
    assert(got(0)._4 == 3.0 / 9.0 && got(1)._4 == 5.0 / 9.0 &&
      got(2)._4 == 6.0 / 9.0)
  }

  test("vocabCoverage: v past the vocab returns the whole vocabulary " +
      "with final coverage exactly 1.0") {
    val docs = Seq((1L, "a b b")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabCoverage(docs, col("text"), v = 100)
      .orderBy("rk").as[(Long, String, Long, Double)].collect()
    assert(got.length == 2 && got.last._4 == 1.0)
    assert(got.head == ((1L, "b", 2L, 2.0 / 3.0)))
  }
}
