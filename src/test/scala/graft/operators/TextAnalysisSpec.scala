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

  test("pmiBigrams: exact counts on a hand corpus, count-desc/(w1,w2) " +
      "order, null/empty/single-token docs contribute no pairs, and the " +
      "result is partitioning-independent") {
    val docs = Seq(
      (1L, "new york new york city"),
      (2L, "new york is big"),
      (3L, "york new haven"),
      (4L, null.asInstanceOf[String]),
      (5L, ""),
      (6L, "solo")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.pmiBigrams(docs, col("text"), minCount = 2,
      topK = 10).as[(String, String, Long, Double)].collect()
    // bigrams: doc1 (new,york)(york,new)(new,york)(york,city);
    // doc2 (new,york)(york,is)(is,big); doc3 (york,new)(new,haven)
    // counts >= 2: (new,york)=3, (york,new)=2
    assert(got.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq(("new", "york", 3L), ("york", "new", 2L)))
    // pmi replay: N_bg = 9, N_tok = 14 ("" and "solo" count one token
    // each; the null doc contributes none), c(new)=4, c(york)=4
    val exp = BigDecimal(math.log(3.0 * 14 * 14 / (9.0 * 4 * 4)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0)._4 == exp, s"pmi ${got(0)._4} != $exp")
    val re = TextAnalysis.pmiBigrams(docs.repartition(7), col("text"),
      minCount = 2, topK = 10).as[(String, String, Long, Double)].collect()
    assert(re.toSeq == got.toSeq)
  }

  test("noveltyVsBase: contained batch doc scores 0, disjoint scores 1, " +
      "partial is the exact shingle fraction; partitioning-independent") {
    // 16-char shingles, stride 4: give each doc >= 2 distinct shingles
    val a = "aaaabbbbccccddddeeee"      // base content
    val b = "zzzzyyyyxxxxwwwwvvvv"      // unseen content
    val docs = Seq(
      (0L, a + a),                       // base
      (2L, "ffffgggghhhhiiiijjjj"),      // base
      (1L, a + a),                       // batch: fully contained -> 0
      (3L, b + b),                       // batch: fully novel -> 1
      (5L, a.substring(0, 16) + b)       // batch: mixed
    ).toDF("doc_id", "text")
    val base = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val got = Dedup.noveltyVsBase(base, batch, col("doc_id"), col("text"))
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._4 == 0.0, s"contained doc must be 0-novel: ${got(1L)}")
    assert(got(3L)._4 == 1.0, s"disjoint doc must be fully novel: ${got(3L)}")
    assert(got(5L)._4 > 0.0 && got(5L)._4 < 1.0)
    assert(got.values.forall(r => r._3 <= r._2))
    val re = Dedup.noveltyVsBase(base.repartition(5), batch.repartition(3),
        col("doc_id"), col("text"))
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(re == got)
  }
}
