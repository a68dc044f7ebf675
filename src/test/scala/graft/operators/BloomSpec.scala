package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every inserted key passes mightContain") {
    val keys = (1L to 2000L).map(_ * 7919L).toDF("k")
    val bitmap = Bloom.bitmapWords(keys, col("k"), numBits = 1 << 15,
      numHashes = 7)
    val misses = keys
      .where(!Bloom.mightContain(col("k"), bitmap, numHashes = 7))
      .count()
    assert(misses === 0L)
  }

  test("false-positive rate stays near the sized target") {
    val keys = (1L to 2000L).toDF("k")
    // ~16 bits/key at m=2^15 → fpp well under 1%
    val bitmap = Bloom.bitmapWords(keys, col("k"), numBits = 1 << 15,
      numHashes = 7)
    val probes = (1_000_001L to 1_020_000L).toDF("k")
    val fp = probes
      .where(Bloom.mightContain(col("k"), bitmap, numHashes = 7))
      .count()
    assert(fp < 400L, s"false-positive count $fp out of 20000 probes")
  }

  test("semiJoin result identical to the plain semi-join (string keys, " +
      "nulls never match)") {
    val big = Seq(
      ("a", 1), ("b", 2), ("c", 3), ("d", 4), (null, 5), ("e", 6),
      ("a", 7), ("zz", 8)).toDF("k", "v")
    val small = Seq("a", "c", "e", "nope").toDF("sk")
      .union(Seq.empty[String].toDF("sk"))
    val got = Bloom.semiJoin(big, small, "k", "sk")
      .orderBy("v").collect().map(r => (r.getString(0), r.getInt(1)))
    val want = big.join(small, col("k") === col("sk"), "left_semi")
      .orderBy("v").collect().map(r => (r.getString(0), r.getInt(1)))
    assert(got.toSeq === want.toSeq)
    assert(got.toSeq === Seq(("a", 1), ("c", 3), ("e", 6), ("a", 7)))
  }

  test("bitmap build is distributed and bounded: word count <= numBits/64") {
    val keys = (1L to 500L).toDF("k")
    val bitmap = Bloom.bitmapWords(keys, col("k"), numBits = 4096,
      numHashes = 5)
    assert(bitmap.length === 4096 / 64)
    assert(bitmap.exists(_ != 0L))
  }

  test("fused bloom_test == composed mightContain on hits, misses and " +
      "null keys") {
    val keys = (1L to 3000L).map(_ * 104729L).toDF("k")
    val bitmap = Bloom.bitmapWords(keys, col("k"), numBits = 1 << 15,
      numHashes = 7)
    val probes = ((1L to 3000L).map(_ * 104729L) ++ (1L to 20000L))
      .map(Option(_)).:+(Option.empty[Long]).toDF("k")
    val disagree = probes
      .select(col("k"),
        Bloom.mightContain(col("k"), bitmap, 7).as("composed"),
        Bloom.mightContainFused(col("k"), bitmap, 7).as("fused"))
      .where(!(col("composed") <=> col("fused")))
      .count()
    assert(disagree === 0L)
  }

  test("forceShuffle plan shape: the bloom prefilter sits BELOW the fact " +
      "side's exchange (sort-merge semi-join sees pre-filtered input)") {
    // range sources, not local relations — Catalyst eagerly evaluates a
    // Filter over a LocalRelation and the prefilter would vanish from
    // the plan under test
    val big = spark.range(1, 5001).select(col("id").as("k"))
    val small = spark.range(1, 5001, 7).select(col("id").as("sk"))
    val p = Bloom.semiJoin(big, small, "k", "sk", forceShuffle = true)
      .queryExecution
      .explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(p.contains("SortMergeJoin") && p.contains("LeftSemi"),
      s"expected sort-merge left-semi join:\n$p")
    // explain prints parents above children: the bloom filter must appear
    // AFTER the fact side's shuffle exchange line — beneath it in the tree
    val exch = p.indexOf("Exchange hashpartitioning(")
    val bloom = p.indexOf("bloom_test")
    assert(exch >= 0, s"expected the fact-side exchange:\n$p")
    assert(bloom > exch,
      s"bloom filter must sit below the exchange (prefilter):\n$p")
  }
}
