package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SelectionSpec extends SparkSpec {
  import spark.implicits._

  // randomized corpus with heavy score ties (so budgetCut's boundary
  // band is exercised), zero-token docs, NULL-token docs, multiple
  // groups, and one degenerate all-one-score group
  private def scoredFixture = {
    val rng = new scala.util.Random(97L)
    val rows = (1L to 3000L).map { i =>
      val g = s"g${rng.nextInt(5)}"
      // 8 distinct scores -> fat bands; group g4 is fully degenerate
      val score =
        if (g == "g4") 0.5 else rng.nextInt(8).toDouble / 10.0
      // NULL n_tokens exercises the null-ignoring-sum contract
      val ntok: Option[Long] =
        if (rng.nextInt(40) == 0) None
        else if (rng.nextInt(25) == 0) Some(0L)
        else Some(rng.nextInt(200).toLong)
      (g, i, score, ntok)
    } ++ Seq(("gnull", 9001L, Double.NaN, Some(10L)), // NaN survives filter
      (null.asInstanceOf[String], 9002L, 0.3, Some(40L)), // NULL grp = own grp
      (null.asInstanceOf[String], 9003L, 0.1, Some(50L)),
      // an ALL-NULL band at (gz, 0.9): its band_tok must coalesce to 0,
      // not poison wholeIn/boundary to NULL and drop the band (r9 ADVICE)
      ("gz", 9004L, 0.9, None), ("gz", 9005L, 0.9, None),
      ("gz", 9006L, 0.2, Some(30L)))
    rows.toDF("grp", "doc_id", "score", "n_tokens")
  }

  test("budgetCut == naive window form on tied/degenerate/zero-token " +
      "corpora, across budgets incl. 0 and exact-boundary") {
    val df = scoredFixture.cache()
    // NaN scores survive both paths (Spark groups/joins NaN as equal) --
    // compare via doubleToLongBits since Scala tuple equality has
    // NaN != NaN
    def canon(t: (String, Long, Double, Option[Long], Boolean)) =
      (t._1, t._2, java.lang.Double.doubleToLongBits(t._3), t._4, t._5)
    val budgets = Seq(0L, 1L, 5000L, 20000L, 10000000L)
    for (b <- budgets) {
      val got = Selection.budgetCut(df, col("grp"), col("doc_id"),
        col("score"), col("n_tokens"), b)
        .as[(String, Long, Double, Option[Long], Boolean)].collect()
        .map(canon).toSet
      val want = Selection.budgetCutNaive(df, col("grp"), col("doc_id"),
        col("score"), col("n_tokens"), b)
        .as[(String, Long, Double, Option[Long], Boolean)].collect()
        .map(canon).toSet
      assert(got == want, s"budget=$b")
      // the all-NULL (gz, 0.9) band must be present, not silently dropped
      assert(got.count(_._1 == "gz") == 3L, s"budget=$b gz band dropped")
    }
    // exact-boundary budget: cumulative total of g1's first 100 docs in
    // naive order — kept set must include exactly those (strict prefix)
    val naiveOrder = Selection.budgetCutNaive(df, col("grp"), col("doc_id"),
      col("score"), col("n_tokens"), Long.MaxValue)
      .filter(col("grp") === "g1")
      .orderBy(col("score").desc, col("doc_id"))
      .as[(String, Long, Double, Option[Long], Boolean)].collect()
    val exact = naiveOrder.take(100).flatMap(_._4).sum
    val gotEx = Selection.budgetCut(df, col("grp"), col("doc_id"),
      col("score"), col("n_tokens"), exact)
      .filter(col("grp") === "g1" && col("kept"))
      .as[(String, Long, Double, Option[Long], Boolean)].collect().toSet
    val wantEx = Selection.budgetCutNaive(df, col("grp"), col("doc_id"),
      col("score"), col("n_tokens"), exact)
      .filter(col("grp") === "g1" && col("kept"))
      .as[(String, Long, Double, Option[Long], Boolean)].collect().toSet
    assert(gotEx == wantEx)
    assert(gotEx.nonEmpty)
  }

  test("budgetCut keeps a strict prefix: kept flags are monotone in " +
      "greedy order within every group, incl. the NULL group") {
    // direct property on budgetCut's OWN output (naive-equivalence is
    // the other test): n_tokens >= 0 makes the running total monotone,
    // so once a doc is dropped no later doc in (score DESC, id ASC)
    // order may be kept
    val out = Selection.budgetCut(scoredFixture, col("grp"), col("doc_id"),
      col("score"), col("n_tokens"), 5000L)
      .as[(String, Long, Double, Option[Long], Boolean)].collect()
    val byGrp = out.groupBy(r => Option(r._1)) // NULL grp is its own group
    assert(byGrp.contains(None), "NULL group missing from output")
    var sawDrop = false
    for ((g, rows) <- byGrp) {
      val ordered = rows.sortWith { (a, b) =>
        val c = java.lang.Double.compare(b._3, a._3) // score DESC, NaN top
        if (c != 0) c < 0 else a._2 < b._2
      }
      val kept = ordered.map(_._5)
      val firstDrop = kept.indexOf(false)
      if (firstDrop >= 0) {
        sawDrop = true
        assert(kept.drop(firstDrop).forall(!_), s"non-prefix kept in $g")
      }
    }
    assert(sawDrop, "budget never binds — fixture/budget too loose")
  }

  private def docsFixture = {
    // two "languages": target docs share a bigram vocabulary disjoint
    // from raw-only docs, so DSIR weights must separate them cleanly
    val tgt = (1L to 40L).map(i =>
      (i, "alpha beta gamma delta epsilon zeta", "en"))
    val raw = (41L to 80L).map(i =>
      (i, "uno dos tres cuatro cinco seis", "es"))
    val mixed = (81L to 90L).map(i =>
      (i, "alpha beta uno dos", "es")) // half target-like
    val junk = Seq((91L, null.asInstanceOf[String], "en"),
      (92L, "single", "en"), (93L, "   ", "en"))
    (tgt ++ raw ++ mixed ++ junk).toDF("doc_id", "text", "lang")
  }

  test("dsirTopK ranks target-distribution docs above raw-only docs; " +
      "mixed docs in between; <2-token and null docs excluded") {
    val out = Selection.dsirTopK(docsFixture, col("doc_id"), col("text"),
      col("lang") === "en", buckets = 256, k = 90)
      .as[(Long, Long, Long, Double)].collect()
    val byId = out.map(r => r._1 -> r._3).toMap
    // every doc with >=2 tokens scored; null/1-token/whitespace dropped
    assert(out.length == 90)
    assert(!byId.contains(91L) && !byId.contains(92L) && !byId.contains(93L))
    val tgtW = (1L to 40L).map(byId)
    val rawW = (41L to 80L).map(byId)
    val mixW = (81L to 90L).map(byId)
    assert(tgtW.min > mixW.max,
      s"target docs must outrank mixed: ${tgtW.min} vs ${mixW.max}")
    assert(mixW.min > rawW.max,
      s"mixed docs must outrank raw-only: ${mixW.min} vs ${rawW.max}")
    // identical text -> identical weight (pure function of content)
    assert(tgtW.toSet.size == 1 && rawW.toSet.size == 1)
    // logw is exactly the micro sum over 1e6 (no extra FP)
    out.foreach { case (_, _, u, w) => assert(w == u.toDouble / 1e6) }
  }

  test("dsirTopK and budgetCut are partitioning-independent (BIGINT " +
      "micro-sums + total-order selection leave no FP/order residue)") {
    val docs = docsFixture
    def runD(parts: Int) =
      Selection.dsirTopK(docs.repartition(parts), col("doc_id"),
        col("text"), col("lang") === "en", buckets = 256, k = 90)
        .as[(Long, Long, Long, Double)].collect().toSet
    assert(runD(1) == runD(7))
    val sc = scoredFixture
    def runB(parts: Int) =
      Selection.budgetCut(sc.repartition(parts), col("grp"), col("doc_id"),
        col("score"), col("n_tokens"), 5000L)
        .filter(!isnan(col("score")))
        .as[(String, Long, Double, Option[Long], Boolean)].collect().toSet
    assert(runB(1) == runB(5))
  }

  test("autoBuckets: smallest pow2 in [256, 2^20] with b*64 >= n, " +
      "monotone, capped; dsirTopK buckets=0 == explicit auto value") {
    assert(Selection.autoBuckets(0L) == 256)
    assert(Selection.autoBuckets(16384L) == 256) // 256*64 boundary
    assert(Selection.autoBuckets(16385L) == 512)
    assert(Selection.autoBuckets(5000L) == 256) // sf0.1
    assert(Selection.autoBuckets(50000L) == 1024) // sf1
    assert(Selection.autoBuckets(500000L) == 8192) // sf10
    assert(Selection.autoBuckets(Long.MaxValue) == (1 << 20)) // cap
    val vals = Seq(1L, 100L, 10000L, 100000L, 1000000L, 100000000L)
      .map(Selection.autoBuckets(_))
    assert(vals == vals.sorted, "autoBuckets must be monotone in n")
    // buckets = 0 sizes from the UNFILTERED corpus count (93 rows -> 256)
    val auto = Selection.dsirTopK(docsFixture, col("doc_id"), col("text"),
      col("lang") === "en", buckets = 0, k = 90)
      .as[(Long, Long, Long, Double)].collect().toSet
    val explicit = Selection.dsirTopK(docsFixture, col("doc_id"),
      col("text"), col("lang") === "en", buckets = 256, k = 90)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(auto == explicit)
  }

  test("dsirTopK: all-target degenerates to zero weights with id-order " +
      "top-k; k caps the output; n_bigrams = tokens-1") {
    val docs = (1L to 30L).map(i => (i, "a b c d e")).toDF("doc_id", "text")
    val out = Selection.dsirTopK(docs, col("doc_id"), col("text"),
      lit(true), buckets = 64, k = 10)
      .as[(Long, Long, Long, Double)].collect()
    assert(out.length == 10)
    // t_cnt == r_cnt and ttot == rtot -> every bucket ratio 1 -> lam 0
    assert(out.forall(_._3 == 0L))
    assert(out.map(_._1).toSeq == (1L to 10L)) // id tie-break
    assert(out.forall(_._2 == 4L))
  }
}
