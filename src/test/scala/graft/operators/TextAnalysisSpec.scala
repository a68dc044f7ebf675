package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("exactDecontamination: in-set projection and bloom-prefilter " +
      "scale tier agree row-for-row (forced via the count limit AND via " +
      "the byte budget); gram INSTANCES are counted; NULL text " +
      "and <n-token docs read clean; empty benchmark reads all-clean") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "a b c d e f g h i j"), // same text as the benchmark doc
      (2L, "totally different words that never overlap anything at all x"),
      (3L, "a b c d e f g h i j"), // the benchmark member itself
      (4L, null.asInstanceOf[String]),
      (5L, "a b c d e f g"),       // 7 tokens < n=8
      (6L, "z a b c d e f g h i j a b c d e f g h i j")) // grams repeat
      .toDF("doc_id", "text")
    val bench = docs.filter(col("doc_id") === 3L)
    def run(limit: Int, bytes: Long = 128L << 20) =
      TextAnalysis.exactDecontamination(
        docs, col("doc_id"), col("text"), bench, col("text"),
        n = 8, inSetLimit = limit, inSetBytes = bytes)
      .orderBy("doc_id")
      .as[(Long, Long, Boolean)].collect().toSeq
    val inSet = run(2000000)
    val bloomByCount = run(0) // over the count limit -> bloom+semi tier
    val bloomByBytes = run(2000000, bytes = 1L) // over the byte budget
    assert(inSet == bloomByCount, s"tiers diverge: $inSet vs $bloomByCount")
    assert(inSet == bloomByBytes,
      s"byte-budget tier diverges: $inSet vs $bloomByBytes")
    // doc 1/3: 10 tokens -> 3 gram instances, all shared with the
    // benchmark; doc 6 embeds the benchmark text twice -> 6 matching
    // windows (instances, not distinct grams)
    assert(inSet == Seq(
      (1L, 3L, true), (2L, 0L, false), (3L, 3L, true),
      (4L, 0L, false), (5L, 0L, false), (6L, 6L, true)))
    // an n-gram-free benchmark (all docs under n tokens): everything clean
    val shortBench = Seq((9L, "too short")).toDF("doc_id", "text")
    val clean = TextAnalysis.exactDecontamination(
        docs, col("doc_id"), col("text"), shortBench, col("text"), n = 8)
      .as[(Long, Long, Boolean)].collect()
    assert(clean.forall(r => r._2 == 0L && !r._3))
  }

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

  test("packSequences: per-shard assignments chain exactly (start_0 = 0, " +
      "start_{i+1} = start_i + n_i), offsets stay under seqLen, boundary-" +
      "spanning docs keep their full token count; empties excluded; " +
      "repartition-invariant") {
    val L = 16
    val docs = ((1L to 40L).map { i =>
      (i, ("tok " * (1 + (i % 13)).toInt).trim) // 1..13 tokens
    } :+ ((98L, ""))  // empty: excluded
      :+ ((99L, null.asInstanceOf[String]))). // null: excluded
      toDF("doc_id", "text")
    val got = TextAnalysis.packSequences(docs, col("doc_id"), col("text"),
        seqLen = L, shards = 4)
      .as[(Long, Int, Long, Long, Long)].collect()
    assert(got.length == 40, s"empty/null docs must be excluded: ${got.length}")
    assert(got.forall { case (_, _, seq, off, n) =>
      seq >= 0 && off >= 0 && off < L && n >= 1 })
    // reconstruct starts and check the concat chain per shard
    got.groupBy(_._2).foreach { case (shard, rows) =>
      val sorted = rows.map { case (id, _, seq, off, n) =>
        (seq * L + off, n, id) }.sortBy(_._1)
      assert(sorted.head._1 == 0L, s"shard $shard must start at 0")
      sorted.sliding(2).foreach {
        case Array((s0, n0, _), (s1, _, _)) =>
          assert(s1 == s0 + n0, s"shard $shard chain broke at $s1")
        case _ =>
      }
      // with 16-token sequences and up-to-13-token docs, spans happen
      assert(rows.length < 2 ||
        sorted.exists { case (s, n, _) => (s % L) + n > L },
        s"shard $shard: expected at least one boundary-spanning doc")
    }
    val re = TextAnalysis.packSequences(docs.repartition(7), col("doc_id"),
        col("text"), seqLen = L, shards = 4)
      .as[(Long, Int, Long, Long, Long)].collect()
    assert(re.sortBy(_._1).toSeq == got.sortBy(_._1).toSeq)
  }
}
