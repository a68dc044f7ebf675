package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def df = (1L to 10000L).map(i =>
    (i, if (i % 3 == 0) "A" else "B")).toDF("k", "s")

  test("stratified sampling is deterministic and repartition-invariant") {
    val rates = Map("A" -> 0.3, "B" -> 0.8)
    val once = Sampling.stratified(df, col("k"), col("s"), rates)
      .select("k").as[Long].collect().sorted
    val again = Sampling.stratified(df.repartition(7), col("k"), col("s"),
      rates).select("k").as[Long].collect().sorted
    assert(once.sameElements(again))
  }

  test("stratified sampling rates land near the target fractions") {
    val rates = Map("A" -> 0.3, "B" -> 0.8)
    val got = Sampling.stratified(df, col("k"), col("s"), rates)
      .groupBy("s").count().as[(String, Long)].collect().toMap
    val totals = df.groupBy("s").count().as[(String, Long)].collect().toMap
    assert(math.abs(got("A").toDouble / totals("A") - 0.3) < 0.05)
    assert(math.abs(got("B").toDouble / totals("B") - 0.8) < 0.05)
  }

  test("snowflake-scale keys don't overflow under ANSI mode") {
    val big = Seq(5000000000L, Long.MaxValue, -17L).map((_, "A")).toDF("k", "s")
    // must not throw ARITHMETIC_OVERFLOW; result content irrelevant here
    Sampling.stratified(big, col("k"), col("s"), Map("A" -> 0.5)).collect()
  }

  test("ids congruent mod 2^32 do not co-sample deterministically") {
    // 64-bit ids sharing their low word must not always land in the same
    // bucket: the high-word fold decorrelates them.
    val low = (1L to 2000L).map((_, "A")).toDF("k", "s")
    val high = (1L to 2000L).map(i => (i + 4294967296L, "A")).toDF("k", "s")
    val selLow = Sampling.stratified(low, col("k"), col("s"), Map("A" -> 0.5))
      .select("k").as[Long].collect().toSet
    val selHigh = Sampling.stratified(high, col("k"), col("s"), Map("A" -> 0.5))
      .select("k").as[Long].collect().map(_ - 4294967296L).toSet
    val overlap = (selLow & selHigh).size.toDouble /
      math.max(1, math.max(selLow.size, selHigh.size))
    // independent ~0.5 samples overlap ~50%; perfectly correlated = 100%
    assert(overlap < 0.75, s"high/low-word samples too correlated: $overlap")
  }

  test("unknown strata are dropped (cut = -1)") {
    val got = Sampling.stratified(df, col("k"), col("s"), Map("A" -> 1.0))
      .select("s").distinct().as[String].collect()
    assert(got.toSeq == Seq("A"))
  }

  test("proportionalSample: Hamilton allocation sums to the budget, " +
      "tracks mass shares, and is partitioning-independent") {
    // masses 60/30/10 over ample docs: budget 10 should split 6/3/1
    val docs = ((1L to 30L).map(i => (i, "en", 20L)) ++
      (31L to 60L).map(i => (i, "es", 10L)) ++
      (61L to 90L).map(i => (i, "de", 333L / 100)))
      .toDF("doc_id", "lang", "m")
      // integer masses: en 600, es 300, de 90 of 990
    val got = Sampling.proportionalSample(docs, col("doc_id"), col("lang"),
        col("m"), budget = 10)
      .select("doc_id", "stratum", "rk", "alloc")
      .as[(Long, String, Long, Long)].collect()
    val byLang = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(got.length == 10, s"budget not exhausted: ${got.length}")
    // exact Hamilton: floors 6/3/0 (de 900/990 -> 0), remainders give the
    // leftover seat to de (rem 900) over es (rem 30) and en (rem 60)...
    // verify against a direct computation instead of hand-arithmetic:
    val masses = Map("en" -> 600L, "es" -> 300L, "de" -> 90L)
    val tot = masses.values.sum
    val fl = masses.view.mapValues(m => 10L * m / tot).toMap
    val left = (10L - fl.values.sum).toInt
    val order = masses.keys.toSeq
      .sortBy(l => (-(10L * masses(l) % tot), l))
    val expect = fl ++ order.take(left).map(l => l -> (fl(l) + 1L)).toMap
    assert(byLang == expect.filter(_._2 > 0).map { case (k, v) =>
      k -> v.toInt }, s"allocation $byLang != $expect")
    // partitioning independence: same selected set after a reshuffle
    val got2 = Sampling.proportionalSample(docs.repartition(7, col("m")),
        col("doc_id"), col("lang"), col("m"), budget = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(got.map(_._1).toSet == got2)
  }

  test("proportionalSample: NULL strata neither receive budget nor " +
      "appear in the sample; an under-populated stratum just exhausts") {
    // the null stratum's huge mass must NOT absorb seats: without the
    // up-front exclusion it would take 4 of 5 and evaporate
    val docs = Seq((1L, "en", 100L), (2L, "en", 100L),
      (3L, null.asInstanceOf[String], 1000L)).toDF("doc_id", "lang", "m")
    val got = Sampling.proportionalSample(docs, col("doc_id"), col("lang"),
        col("m"), budget = 5)
      .select("doc_id", "stratum").as[(Long, String)].collect()
    assert(got.forall(_._2 == "en"), s"null stratum leaked: ${got.toSeq}")
    assert(got.map(_._1).toSet == Set(1L, 2L))
  }

  test("weightedBernoulli: zero/NULL weights never select, saturated " +
      "weights always select, rates track num*w/den, hostile huge " +
      "weights saturate instead of ANSI-overflowing; repartition-" +
      "invariant") {
    import org.apache.spark.sql.functions.lit
    val n = 4000
    val rows = (0 until n).map { i =>
      val w: java.lang.Long = i % 4 match {
        case 0 => 0L                    // never
        case 1 => null                  // never
        case 2 => 250L                  // ~half
        case 3 => 600L                  // >= den: always
      }
      (i.toLong, w)
    }.toDF("id", "w")
    val got = Sampling.weightedBernoulli(rows, col("id"), col("w"),
      num = 1, den = 500).select("id").as[Long].collect().toSet
    assert(!got.exists(_ % 4 == 0) && !got.exists(_ % 4 == 1),
      "zero/NULL weights must never select")
    assert((0 until n).count(i => i % 4 == 3 && got(i.toLong)) == n / 4,
      "weights >= den must always select")
    val halfRate = (0 until n).count(i => i % 4 == 2 && got(i.toLong)) /
      (n / 4.0)
    assert(math.abs(halfRate - 0.5) < 0.1,
      s"w=den/2 rate $halfRate far from 0.5")
    // hostile weight: saturates (selected), never an ANSI overflow
    val huge = Seq((1L, Long.MaxValue - 1)).toDF("id", "w")
    assert(Sampling.weightedBernoulli(huge, col("id"), col("w"),
      num = 7, den = 500).count() == 1)
    // hostile NEGATIVE weight: clamps to 0 (never selects), never an
    // ANSI overflow from the multiply (-2^62 · 2^20 would throw)
    val hugeNeg = Seq((1L, -(1L << 62)), (2L, -1L)).toDF("id", "w")
    assert(Sampling.weightedBernoulli(hugeNeg, col("id"), col("w"),
      num = 1 << 20, den = 500).count() == 0,
      "negative weights must clamp to never-select")
    val re = Sampling.weightedBernoulli(rows.repartition(13), col("id"),
      col("w"), num = 1, den = 500).select("id").as[Long].collect().toSet
    assert(re == got)
  }
}
