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
}
