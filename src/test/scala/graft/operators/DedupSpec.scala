package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"), // exact dup of 1
    (3L, "quick the brown fox jumps over the lazy dog again again and"), // bag dup of 1
    (4L, "completely different content about spark query engines at scale"),
    (5L, "the quick brown fox jumps over the lazy dog again and AGAIN!")  // near dup
  ).toDF("doc_id", "text")

  test("exact dedup keeps min id per byte-identical group") {
    val r = Dedup.exact(docs, col("doc_id"), col("text"))
      .orderBy("doc_id")
      .select("doc_id", "group_n", "is_kept").as[(Long, Long, Boolean)].collect()
    assert(r(0) == ((1L, 2L, true)))
    assert(r(1) == ((2L, 2L, false)))
    assert(r(2)._3 && r(3)._3 && r(4)._3)
  }

  test("normalized dedup groups word-shuffles together") {
    val r = Dedup.normalized(docs, col("doc_id"), col("text"))
      .filter(col("group_n") === 3).select("doc_id").as[Long].collect().sorted
    assert(r.toSeq == Seq(1L, 2L, 3L)) // 1,2,3 share the token bag
  }

  test("jaccard pairs find the near-dup, not the unrelated doc") {
    val pairs = Dedup.jaccardPairs(docs, col("doc_id"), col("text"),
        threshold = 0.3, maxDf = 100)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 5L)) || pairs.contains((2L, 5L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("containment pairs catch the unequal-size inclusion jaccard " +
      "misses, and agree with jaccard on the symmetric near-dup") {
    val small = "the quick brown fox jumps over the lazy dog again and again"
    val big = small + " " + (1 to 40).map(i =>
      s"unrelated filler sentence number $i about engines").mkString(" ")
    val d = Seq(
      (1L, small),              // contained whole in 2
      (2L, big),                // contains 1, much longer
      (3L, small + " tail!"),   // symmetric near-dup of 1
      (4L, "completely different content about spark query engines at scale")
    ).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(d, col("doc_id"), col("text"),
        threshold = 0.8, maxDf = 100)
      .select(col("doc_a"), col("doc_b"), col("cont_a"), col("cont_b"))
      .as[(Long, Long, Double, Double)].collect()
    val jac = Dedup.jaccardPairs(d, col("doc_id"), col("text"),
        threshold = 0.5, maxDf = 100)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // the quoted-inside pair: high containment (1 ⊂ 2), invisible to
    // jaccard at any symmetric threshold (union is big-doc-sized)
    val incl = cont.find(p => p._1 == 1L && p._2 == 2L)
    assert(incl.isDefined, "containment must surface the inclusion pair")
    assert(incl.get._3 >= 0.8, "cont_a = |A∩B|/|A| ~ 1 for the quoted doc")
    assert(!jac.contains((1L, 2L)), "jaccard misses the inclusion pair")
    // the symmetric near-dup surfaces in both
    assert(cont.exists(p => p._1 == 1L && p._2 == 3L))
    assert(jac.contains((1L, 3L)))
    // the unrelated doc appears in neither
    assert(!cont.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minhash LSH recall vs exact jaccard ground truth on real corpus") {
    val d = Tables.documents(spark, sf())
    val exact = Dedup.jaccardPairs(d, col("doc_id"), col("text"),
        threshold = 0.7, maxDf = 1000000)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashDedup(d, col("doc_id"), col("text"), threshold = 0.7)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // no false positives above threshold (both verify with exact jaccard)
    assert(lsh.subsetOf(exact))
    // recall: banding (16 hashes, 4 bands) keeps >=80% at j>=0.7
    if (exact.nonEmpty) {
      val recall = lsh.intersect(exact).size.toDouble / exact.size
      assert(recall >= 0.8, s"recall $recall over ${exact.size} pairs")
    }
  }

  test("minhash star fuse: mega-cluster candidates go linear, component " +
      "connectivity (the dedup result) is unchanged") {
    // 40 identical docs = one LSH bucket per band = 780 pairs uncapped;
    // the 100 TB shape is this cluster at 10^6 members (10^11 pairs)
    val cluster = (1L to 40L).map(i =>
      i -> "template boilerplate page body repeated across the whole crawl")
    val others = Seq(
      100L -> "a genuinely unique document about distributed query engines",
      101L -> "another distinct text with its own shingle profile entirely")
    val d = (cluster ++ others).toDF("doc_id", "text")
    val uncapped = Dedup.minhashCandidates(d, col("doc_id"), col("text"))
      .as[(Long, Long)].collect().toSet
    val capped = Dedup.minhashCandidates(d, col("doc_id"), col("text"),
        maxBucketSize = 10)
      .as[(Long, Long)].collect().toSet
    assert(uncapped.size >= 780, s"uncapped ${uncapped.size}")
    // star: every capped pair is anchored at the bucket minimum, count is
    // LINEAR in cluster size
    assert(capped == (2L to 40L).map(i => (1L, i)).toSet,
      s"capped ${capped.size}")
    // connectivity proof: components over star pairs == over all pairs
    val ids = d.select(col("doc_id"))
    def comp(pairs: Set[(Long, Long)]) =
      Dedup.components(pairs.toSeq.toDF("doc_a", "doc_b"), ids)
        .as[(Long, Long)].collect().toMap
    assert(comp(capped) == comp(uncapped))
    // verified dedup output: same pairs survive the jaccard filter on the
    // star set as the star subset of the uncapped survivors
    val dedupCapped = Dedup.minhashDedup(d, col("doc_id"), col("text"),
        threshold = 0.5, maxBucketSize = 10)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(dedupCapped == capped, "identical docs all pass jaccard=1")
  }

  test("bpe-ish tokenizer splits punctuation/digit runs that whitespace " +
      "tokenization merges") {
    val df = Seq(("foo,bar! x2", "")).toDF("t", "e")
    val (bpe, ws, bpeEmpty) = df.select(
      TextAnalysis.bpeTokenCount(col("t")),
      TextAnalysis.tokenCount(col("t")),
      TextAnalysis.bpeTokenCount(col("e")))
      .as[(Long, Long, Long)].head()
    // foo | , | bar | ! | " x" | "2" -> 6 BPE-ish vs 2 whitespace tokens
    assert(bpe == 6L && ws == 2L && bpeEmpty == 0L)
    val toks = df.select(TextAnalysis.bpeTokens(col("t")))
      .as[Seq[String]].head()
    assert(toks == Seq("foo", ",", "bar", "!", " x", "2"))
  }

  test("connected components: transitive pairs cluster to min id, " +
      "isolated nodes keep their own") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("a", "b")
    val ids = (1L to 9L).toDF("id")
    val got = Dedup.components(pairs, ids)
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L) // chain 1-2-3
    assert(got(7L) == 7L && got(9L) == 7L)
    assert(Seq(4L, 5L, 6L, 8L).forall(i => got(i) == i))    // isolated
  }

  test("connected components: pointer jumping converges a 40-hop chain " +
      "in few rounds (the sf0.1 graph has eccentricity 16)") {
    val pairs = (1L to 39L).map(i => (i, i + 1)).toDF("a", "b")
    val ids = (1L to 40L).toDF("id")
    // hop-per-round needs 39 rounds; hop+jump doubles distance per round.
    // driverMaxEdges = 0 forces the distributed loop under test.
    val got = Dedup.components(pairs, ids, maxIter = 10, driverMaxEdges = 0L)
      .as[(Long, Long)].collect()
    assert(got.forall(_._2 == 1L))
  }

  test("survivors keep the highest-quality member per component, " +
      "ties to lowest id; isolated nodes survive") {
    val comp = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L))
      .toDF("id", "component")
    val quality = Seq((1L, 10L), (2L, 99L), (3L, 99L), (4L, 5L))
      .toDF("id", "q")
    val got = Dedup.survivors(comp, quality, col("q"))
      .select("id", "is_survivor").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> false, 2L -> true, 3L -> false, 4L -> true))
  }

  test("connected components throw on non-convergence instead of " +
      "silently emitting a partial clustering") {
    val pairs = (1L to 39L).map(i => (i, i + 1)).toDF("a", "b")
    val ids = (1L to 40L).toDF("id")
    intercept[IllegalStateException] {
      // driverMaxEdges = 0 forces the distributed loop (the driver
      // union-find fast path has no iteration budget to exhaust)
      Dedup.components(pairs, ids, maxIter = 2, driverMaxEdges = 0L).collect()
    }
  }

  test("connected components: empty pair set -> every node isolated, " +
      "on both paths") {
    val pairs = Seq.empty[(Long, Long)].toDF("a", "b")
    val ids = (1L to 5L).toDF("id")
    for (bound <- Seq(0L, 1000L)) {
      val got = Dedup.components(pairs, ids, driverMaxEdges = bound)
        .as[(Long, Long)].collect().toMap
      assert(got == (1L to 5L).map(i => i -> i).toMap)
    }
  }

  test("connected components: non-integral id types are rejected loudly " +
      "(both the collect path and the decimal convergence sum are numeric)") {
    val pairs = Seq(("b", "c"), ("c", "a10")).toDF("x", "y")
    val ids = Seq("a10", "b", "c", "z").toDF("id")
    val e = intercept[IllegalArgumentException] {
      Dedup.components(pairs, ids).collect()
    }
    assert(e.getMessage.contains("integral node ids"))
  }

  test("connected components: driver fast path and distributed loop agree") {
    // a few chains + a cycle + isolated nodes
    val pairs = ((1L to 9L).map(i => (i, i + 1)) ++
      Seq((20L, 21L), (21L, 22L), (22L, 20L), (30L, 31L)))
      .toDF("a", "b")
    val ids = (1L to 35L).toDF("id")
    val fast = Dedup.components(pairs, ids)
      .as[(Long, Long)].collect().toMap
    val dist = Dedup.components(pairs, ids, driverMaxEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(fast == dist)
    assert(fast(10L) == 1L && fast(22L) == 20L && fast(31L) == 30L &&
      fast(35L) == 35L)
  }

  test("simhash: identical docs distance 0, near-dups within radius") {
    val sh = Dedup.simhash(docs, col("doc_id"), col("text"))
      .as[(Long, Long)].collect().toMap
    assert(sh(1L) == sh(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(5L)) <= 12)
    assert(ham(sh(1L), sh(4L)) > 12)
    val pairs = Dedup.simhashPairs(docs, col("doc_id"), col("text"), maxHamming = 6)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("incrementalDedup: exact fp hit, word-shuffle hit, near-dup via " +
      "cross-side LSH, novel doc clean; base never flags itself") {
    val base = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "completely unrelated text about distributed query engines at scale"),
      (4L, "a third base document with its own unique and stable content here"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "again and again today the quick brown fox jumps over the lazy dog"),
      (5L, "the quick brown fox jumps over the lazy dog again and again tonight"),
      (7L, "an entirely novel batch document sharing nothing with the base set"))
      .toDF("doc_id", "text")
    val got = Dedup.incrementalDedup(base, batch, col("doc_id"),
        col("text"), threshold = 0.5)
      .as[(Long, Boolean, Boolean)].collect().sortBy(_._1)
    val byId = got.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.length == 4)
    assert(byId(1L)._1, "verbatim copy must be an exact dup")
    assert(byId(3L) == ((true, false)) || byId(3L)._1,
      "word shuffle must hit the normalized fingerprint")
    assert(!byId(5L)._1 && byId(5L)._2,
      "one-word change must be a near dup, not exact")
    assert(byId(7L) == ((false, false)), "novel doc must pass clean")
    // partitioning independence
    val re = Dedup.incrementalDedup(base.repartition(5),
        batch.repartition(3), col("doc_id"), col("text"), threshold = 0.5)
      .as[(Long, Boolean, Boolean)].collect().sortBy(_._1)
    assert(re.toSeq == got.toSeq)
  }

  test("incrementalDedup against a MATERIALIZED index == the recompute " +
      "path (verdicts identical, incl. under the bucket cap); the index " +
      "maintains by parquet append") {
    val base = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "completely unrelated text about distributed query engines at scale"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (5L, "the quick brown fox jumps over the lazy dog again and again tonight"),
      (7L, "an entirely novel batch document sharing nothing with the base set"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("dedup-index").toString
    Dedup.writeDedupIndex(base, col("doc_id"), col("text"), dir)
    def run(f: => org.apache.spark.sql.DataFrame) =
      f.as[(Long, Boolean, Boolean)].collect().sortBy(_._1).toSeq
    val direct = run(Dedup.incrementalDedup(base, batch, col("doc_id"),
      col("text"), threshold = 0.5, maxBucketSize = 4))
    val indexed = run(Dedup.incrementalDedupWithIndex(dir, batch,
      col("doc_id"), col("text"), threshold = 0.5, maxBucketSize = 4))
    assert(indexed == direct)
    assert(direct.map(r => (r._1, r._2, r._3)) ==
      Seq((1L, true, true), (5L, false, true), (7L, false, false)))
    // incremental maintenance: append the admitted batch docs' rows and
    // the grown index flags a near-copy of a BATCH doc
    val admitted = batch.filter(col("doc_id") === 7L)
    Dedup.writeDedupIndex(admitted, col("doc_id"), col("text"),
      s"$dir/tmp2")
    for (rel <- Seq("fp", "banded", "sh"))
      spark.read.parquet(s"$dir/tmp2/$rel")
        .write.mode("append").parquet(s"$dir/$rel")
    // an exact copy hits the appended fingerprint AND (identical
    // signatures → every band) the appended buckets deterministically —
    // LSH recall on a merely-near copy is probabilistic, so the append
    // proof uses the deterministic pair
    val batch2 = Seq(
      (9L, "an entirely novel batch document sharing nothing with the base set"))
      .toDF("doc_id", "text")
    val got2 = run(Dedup.incrementalDedupWithIndex(dir, batch2,
      col("doc_id"), col("text"), threshold = 0.5))
    assert(got2 == Seq((9L, true, true)),
      "copy of an appended doc must be flagged by the grown index")
  }

  test("fuzzyBlockPairs (PassJoin segment filter) == all-pairs naive form " +
      "on randomized corpora: mutated strings, mixed lengths, empties, " +
      "unicode, several thresholds") {
    val rng = new scala.util.Random(20260814L)
    val alphabet = "abcdeé北xyz "
    def randStr(n: Int): String =
      (1 to n).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
    def mutate(s: String, edits: Int): String = {
      var cur = s
      (1 to edits).foreach { _ =>
        val ops = rng.nextInt(3)
        val p = if (cur.isEmpty) 0 else rng.nextInt(cur.length)
        cur = ops match {
          case 0 if cur.nonEmpty => // substitute
            cur.updated(p, alphabet(rng.nextInt(alphabet.length)))
          case 1 => // insert
            cur.substring(0, p) + alphabet(rng.nextInt(alphabet.length)) +
              cur.substring(p)
          case _ if cur.nonEmpty => cur.substring(0, p) + cur.substring(p + 1)
          case _ => cur
        }
      }
      cur
    }
    // seeds of several lengths (incl. shorter than maxDist+1 and empty),
    // each with a cloud of 0-7-edit mutants, spread over two blocks
    val seeds = Seq(0, 1, 3, 8, 20, 32).map(randStr)
    val rows = (seeds.zipWithIndex.flatMap { case (s, si) =>
      (0 to 7).map { e =>
        (si * 100L + e, if (si % 2 == 0) "blockA" else "blockB",
          mutate(s, e))
      }
    } :+ ((999L, "blockA", ""))).toDF("doc_id", "blk", "key")
    for (t <- Seq(0, 2, 5)) {
      val fast = Dedup.fuzzyBlockPairs(rows, col("doc_id"), col("blk"),
          col("key"), maxDist = t)
        .as[(Long, Long, Int)].collect().toSet
      val naive = Dedup.fuzzyBlockPairsNaive(rows, col("doc_id"), col("blk"),
          col("key"), maxDist = t)
        .as[(Long, Long, Int)].collect().toSet
      assert(fast == naive, s"maxDist=$t: " +
        s"missing=${(naive -- fast).take(5)} extra=${(fast -- naive).take(5)}")
      assert(t == 0 || fast.nonEmpty, s"degenerate corpus at t=$t")
    }
  }

  test("MinHashSigsExpr (fused projection) == composed explode+groupBy " +
      "aggregate form: random texts, unicode, single-char, duplicates; " +
      "NULL/shingle-less docs absent from both") {
    val rng = new scala.util.Random(20260817L)
    val alphabet = "abcdefé北 .,xyz"
    def randText(n: Int): String =
      (1 to n).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
    val rows = ((1 to 60).map(i => (i.toLong, randText(rng.nextInt(200)))) ++
      Seq((100L, null.asInstanceOf[String]), (101L, ""), (102L, "x"),
        (103L, "the the the the the the the the"),
        (104L, randText(40)), (105L, randText(40))))
      .toDF("doc_id", "text")
    val k = 16
    // composed reference: the pre-r9 explode → groupBy(doc_id) aggregate
    val sh = Dedup.hashedShingles(rows, col("doc_id"), col("text"),
        portable = true)
      .withColumn("x", pmod(col("shh"), lit(Dedup.P)))
    val mins = Dedup.hashParams(k).zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("x") * lit(a) + lit(b), lit(Dedup.P))).as(s"sig_$i")
    }
    // the aggregate form emits a NULL-signature row for a NULL-text doc
    // (charShingles yields [NULL] → min over one NULL = NULL); the fused
    // form drops it — equivalent downstream, since a NULL bucket can
    // never survive the shingle-intersection verify and NULL n_match
    // fails every estimate filter. Compare over the non-degenerate rows.
    val composed = sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
      .filter(col("sig_0").isNotNull)
      .collect().map(r => r.getLong(0) ->
        (0 until k).map(i => r.getLong(i + 1)).toSeq).toMap
    val fused = Dedup.minhashSignatures(rows, col("doc_id"), col("text"), k)
      .collect().map(r => r.getLong(0) ->
        (0 until k).map(i => r.getLong(i + 1)).toSeq).toMap
    assert(fused == composed)
    assert(!fused.contains(100L), "NULL text must yield no signature row")
  }

  /** Skewed fuzzy corpus: every key shares a constant 12-char prefix
    * (zero-entropy head — the shape the collision-adaptive boundaries
    * exist for) with a random tail; several true near-dup pairs per
    * block.
    */
  private def skewedFuzzyCorpus(nPerBlock: Int, blocks: Int,
      seed: Long): org.apache.spark.sql.DataFrame = {
    val rng = new scala.util.Random(seed)
    val alphabet = "abcdefghij"
    def tail(n: Int): String =
      (1 to n).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
    def mutate(s: String, edits: Int): String = {
      var cur = s
      (1 to edits).foreach { _ =>
        val p = 12 + rng.nextInt(math.max(1, cur.length - 12))
        cur = rng.nextInt(3) match {
          case 0 => cur.updated(p, alphabet(rng.nextInt(alphabet.length)))
          case 1 => cur.substring(0, p) +
            alphabet(rng.nextInt(alphabet.length)) + cur.substring(p)
          case _ => cur.substring(0, p) + cur.substring(p + 1)
        }
      }
      cur
    }
    val perSeed = 4
    (0 until blocks).flatMap { b =>
      (0 until nPerBlock).map { i =>
        val seedKey = "constanthead" + tail(18)
        (i, seedKey)
      }.flatMap { case (i, seedKey) =>
        (0 until perSeed).map { e =>
          (b * 10000L + i * 10L + e, s"block$b", mutate(seedKey, e))
        }
      }
    }.toDF("doc_id", "blk", "key")
  }

  test("segmentBounds adaptive branch (forced): completeness, boundary " +
      "invariants 0 = b0 <= ... <= b_tau+1 = L (strict when L >= tau+1), " +
      "head-skew moves a boundary off the even split, and " +
      "fuzzyBlockPairs == naive under the adaptive scheme") {
    val savedMin = Dedup.SegStatsMinDocs
    val savedSample = Dedup.SegStatsSampleDocs
    Dedup.SegStatsMinDocs = 1L
    Dedup.SegStatsSampleDocs = 1000000L
    try {
      val rows = skewedFuzzyCorpus(nPerBlock = 40, blocks = 2,
        seed = 20260815L)
      val t = 2
      val d = rows.select(col("doc_id").as("fz_id"),
        col("blk").as("fz_block"), col("key").as("fz_key"),
        length(col("key")).as("fz_len"))
      val bounds = Dedup.segmentBounds(d, t)
        .as[(Long, Int, Seq[Int])].collect()
      // completeness: one row per (block-hash, length) group, exactly
      val expected = d.select(xxhash64(col("fz_block")).as("bk"),
        col("fz_len")).distinct().as[(Long, Int)].collect().toSet
      assert(bounds.map(b => (b._1, b._2)).toSet == expected)
      assert(bounds.length == expected.size, "duplicate bounds rows")
      bounds.foreach { case (bk, l, barr) =>
        assert(barr.length == t + 2, s"arity: $barr for L=$l")
        assert(barr.head == 0 && barr.last == l, s"ends: $barr for L=$l")
        assert(barr.sliding(2).forall(p => p(0) <= p(1)),
          s"not monotone: $barr for L=$l")
        if (l >= t + 1)
          assert(barr.sliding(2).forall(p => p(0) < p(1)),
            s"empty segment: $barr for L=$l in group $bk")
      }
      // the 12-char constant head means cp(0, x) == 1 for x <= 12: the
      // DP must extend segment 0 past the even-split boundary 10
      val evenOnly = bounds.forall { case (_, l, barr) =>
        barr == (0 to t + 1).map(i => i * l / (t + 1)) }
      assert(!evenOnly, "adaptive branch produced only even splits on a " +
        "constant-head corpus — the DP did not run")
      val fast = Dedup.fuzzyBlockPairs(rows, col("doc_id"), col("blk"),
        col("key"), maxDist = t).as[(Long, Long, Int)].collect().toSet
      val naive = Dedup.fuzzyBlockPairsNaive(rows, col("doc_id"),
        col("blk"), col("key"), maxDist = t)
        .as[(Long, Long, Int)].collect().toSet
      assert(fast.nonEmpty && fast == naive, s"adaptive-scheme mismatch: " +
        s"missing=${(naive -- fast).take(5)} extra=${(fast -- naive).take(5)}")
    } finally {
      Dedup.SegStatsMinDocs = savedMin
      Dedup.SegStatsSampleDocs = savedSample
    }
  }

  test("segmentBounds universe overflow (r8 regression): with " +
      "SegGridMaxRows forced below the group count, no group may vanish " +
      "from the bounds relation — fuzzyBlockPairs == naive, pairs in " +
      "groups past the truncation point included") {
    val savedGrid = Dedup.SegGridMaxRows
    Dedup.SegGridMaxRows = 2 // corpus below has >= 6 (block, length) groups
    try {
      val rows = skewedFuzzyCorpus(nPerBlock = 30, blocks = 4,
        seed = 20260816L)
      val nGroups = rows.select(col("blk"), length(col("key")))
        .distinct().count()
      assert(nGroups > 2, s"fixture must overflow the forced cap: $nGroups")
      val fast = Dedup.fuzzyBlockPairs(rows, col("doc_id"), col("blk"),
        col("key"), maxDist = 2).as[(Long, Long, Int)].collect().toSet
      val naive = Dedup.fuzzyBlockPairsNaive(rows, col("doc_id"),
        col("blk"), col("key"), maxDist = 2)
        .as[(Long, Long, Int)].collect().toSet
      assert(fast.nonEmpty && fast == naive, s"overflow dropped pairs: " +
        s"missing=${(naive -- fast).take(5)} extra=${(fast -- naive).take(5)}")
    } finally Dedup.SegGridMaxRows = savedGrid
  }

  test("char-bag bound soundness: bagL1(a, b) <= 2*lev(a, b) on random " +
      "pairs incl. unicode, saturation and empties (the pre-levenshtein " +
      "reject may never kill a true pair)") {
    import graft.functions.BagOps
    import org.apache.spark.unsafe.types.UTF8String
    val rng = new scala.util.Random(20260815L)
    val alphabet = "abcdeé北XYZ019 ,"
    def randStr(n: Int): String =
      (1 to n).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
    def levExact(a: String, b: String): Int = {
      val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
          m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      m(a.length)(b.length)
    }
    def bagL1(a: String, b: String): Int = {
      val (ua, ub) = (UTF8String.fromString(a), UTF8String.fromString(b))
      BagOps.l1(BagOps.bagHalf(ua, 0), BagOps.bagHalf(ub, 0)) +
        BagOps.l1(BagOps.bagHalf(ua, 1), BagOps.bagHalf(ub, 1))
    }
    // saturating edge: >15 repeats of one char must still bound
    assert(bagL1("a" * 40, "a" * 20) <= 2 * levExact("a" * 40, "a" * 20))
    assert(bagL1("", "abc") <= 2 * 3)
    for (_ <- 1 to 300) {
      val a = randStr(rng.nextInt(40))
      val b = if (rng.nextBoolean()) randStr(rng.nextInt(40))
        else a.drop(rng.nextInt(3)) + randStr(rng.nextInt(4))
      val (l1, lv) = (bagL1(a, b), levExact(a, b))
      assert(l1 <= 2 * lv, s"unsound: bagL1=$l1 > 2*lev=$lv for " +
        s"a=\"$a\" b=\"$b\"")
    }
  }

  test("repeatedPassages: shared 32-token paragraph flagged in BOTH docs, " +
      "unique docs 0.0, sub-window docs absent, intra-doc repeat alone " +
      "is NOT cross-doc") {
    val para = (1 to 32).map(i => s"boiler$i").mkString(" ")
    val uniq1 = (1 to 32).map(i => s"alpha$i").mkString(" ")
    val uniq2 = (1 to 32).map(i => s"beta$i").mkString(" ")
    val selfRep = (1 to 32).map(i => s"gamma$i").mkString(" ")
    val d = Seq(
      (1L, s"$para $uniq1"),          // 2 windows, 1 repeated (para in doc 2)
      (2L, s"$uniq2 $para"),          // 2 windows, 1 repeated
      (3L, (1 to 64).map(i => s"solo$i").mkString(" ")), // unique, 2 windows
      (4L, s"$selfRep $selfRep"),     // intra-doc repeat only -> NOT repeated
      (5L, "too short to window"))    // < 32 tokens -> absent
      .toDF("doc_id", "text")
    val got = Dedup.repeatedPassages(d, col("doc_id"), col("text"))
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.map(r => (r._1, r._2, r._3, r._4)).toSeq == Seq(
      (1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5), (3L, 2L, 0L, 0.0),
      (4L, 2L, 0L, 0.0)))
    // partitioning independence
    val re = Dedup.repeatedPassages(d.repartition(7), col("doc_id"),
        col("text"))
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(re.toSeq == got.toSeq)
  }

  test("portableHash64 distribution: per-bit balance, low pairwise bit " +
      "correlation, and bounded bucket skew — the gate the whole " +
      "MinHash/SimHash/KMV family keys on (a md5-fold tweak that skews " +
      "bucket sizes must fail here, not at corpus scale)") {
    // mixed-shape corpus: short ids, numerics, emails, unicode
    val corpus = ((1 to 8000).map(i => s"doc $i") ++
      (1 to 6000).map(_.toString) ++
      (1 to 6000).map(i => s"user_$i@example.com") ++
      (1 to 4000).map(i => s"北京 document №$i")).toDF("s")
    val hs = corpus.select(Dedup.portableHash64(col("s")).as("h"))
      .as[Long].collect()
    val n = hs.length
    assert(hs.distinct.length == n, "hash collisions in a 24k corpus")
    assert(hs.forall(h => h >= 0 && h < (1L << 60)), "60-bit range")
    // per-bit balance across the 60 usable bits: ±0.03 of 0.5 is ~9
    // sigma at n=24000 — a pass is structural, not lucky
    val ones = new Array[Int](60)
    hs.foreach { h =>
      var b = 0
      while (b < 60) { ones(b) += ((h >>> b) & 1L).toInt; b += 1 }
    }
    (0 until 60).foreach { b =>
      val frac = ones(b).toDouble / n
      assert(math.abs(frac - 0.5) < 0.03, s"bit $b balance $frac")
    }
    // pairwise bit correlation, all 1770 pairs: |phi| < 0.05 (~7 sigma)
    val both = Array.ofDim[Int](60, 60)
    hs.foreach { h =>
      var i = 0
      while (i < 60) {
        if (((h >>> i) & 1L) == 1L) {
          var j = i + 1
          while (j < 60) {
            if (((h >>> j) & 1L) == 1L) both(i)(j) += 1
            j += 1
          }
        }
        i += 1
      }
    }
    for (i <- 0 until 60; j <- (i + 1) until 60) {
      val pi = ones(i).toDouble / n; val pj = ones(j).toDouble / n
      val phi = (both(i)(j).toDouble / n - pi * pj) /
        math.sqrt(pi * (1 - pi) * pj * (1 - pj))
      assert(math.abs(phi) < 0.05, s"bits ($i,$j) correlation $phi")
    }
    // bucket skew at the modular fan-outs the queries use (64 shards =
    // q101, 1024 = LSH-scale buckets): chi-square within ~4 sigma
    for (k <- Seq(64, 1024)) {
      val counts = new Array[Int](k)
      hs.foreach(h => counts((h % k).toInt) += 1)
      val e = n.toDouble / k
      val chi2 = counts.map(c => (c - e) * (c - e) / e).sum
      val bound = (k - 1) + 4 * math.sqrt(2.0 * (k - 1))
      assert(chi2 < bound, s"mod-$k chi2 $chi2 over bound $bound")
    }
  }

  test("incrementalDedup cross-side hot-bucket cap: candidate volume goes " +
      "linear in the batch, verdicts unchanged, representatives are the " +
      "lowest base ids") {
    // one boilerplate mega-cluster spanning BOTH sides — the shape whose
    // cross join is |base bucket| x |batch bucket| without the fuse
    val tpl = "template boilerplate page body repeated across the whole crawl"
    val base = ((0L until 80L by 2).map(i => (i, tpl)) :+
      ((100L, "a genuinely unique base document about query engines")))
      .toDF("doc_id", "text")
    val batch = ((1L until 80L by 2).map(i => (i, tpl)) :+
      ((101L, "an entirely novel batch document sharing nothing at all")))
      .toDF("doc_id", "text")
    val cap = 4
    val uncapped = Dedup.crossCandidates(base, batch, col("doc_id"),
      col("text"), k = 16, bands = 4, maxBucketSize = Int.MaxValue).count()
    assert(uncapped == 40L * 40L, s"uncapped $uncapped") // the quadratic form
    val capped = Dedup.crossCandidates(base, batch, col("doc_id"),
      col("text"), k = 16, bands = 4, maxBucketSize = cap).cache()
    // bounded: each batch doc meets at most bands x cap base reps (here the
    // four bands share one membership, so exactly `cap` distinct mates)
    val maxPerNew = capped.groupBy(col("doc_new")).count()
      .agg(max(col("count"))).as[Long].head()
    assert(maxPerNew <= cap.toLong, s"maxPerNew $maxPerNew")
    // deterministic representatives = the cap lowest base doc_ids
    val reps = capped.filter(col("doc_new") =!= 101L)
      .select(col("doc_base")).distinct().as[Long].collect().toSet
    assert(reps == Set(0L, 2L, 4L, 6L), s"reps $reps")
    // the dedup RESULT is unchanged by the fuse: every batch cluster
    // member still verifies near-dup against a representative
    val got = Dedup.incrementalDedup(base, batch, col("doc_id"),
        col("text"), threshold = 0.5, maxBucketSize = cap)
      .as[(Long, Boolean, Boolean)].collect().map(r => r._1 -> r._3).toMap
    assert((1L until 80L by 2).forall(got(_)), "cluster members flagged")
    assert(!got(101L), "novel doc clean")
  }

  test("estimated pairs: exact dup scores 16/16, unrelated doc excluded, " +
      "and the estimate agrees with the signature overlap") {
    val est = Dedup.minhashEstimatedPairs(docs, col("doc_id"), col("text"),
        threshold = 0.5)
      .select("doc_a", "doc_b", "n_match", "est_jaccard")
      .as[(Long, Long, Int, Double)].collect()
    val byPair = est.map(r => (r._1, r._2) -> r).toMap
    // byte-identical docs 1/2 share every shingle => identical signatures
    assert(byPair((1L, 2L))._3 == 16 && byPair((1L, 2L))._4 == 1.0)
    // doc 4 shares no shingles with the dup cluster
    assert(!est.exists(r => r._1 == 4L || r._2 == 4L))
    // est_jaccard is exactly n_match / k and the cut is >= 8/16
    assert(est.forall(r => r._4 == r._3.toDouble / 16.0 && r._3 >= 8))
    // estimated pairs are a SUBSET of the banded candidates (the
    // estimate filters candidates, never invents pairs)
    val cands = Dedup.minhashCandidates(docs, col("doc_id"), col("text"))
      .as[(Long, Long)].collect().toSet
    assert(est.forall(r => cands.contains((r._1, r._2))))
  }
}
