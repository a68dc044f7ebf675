package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based approximations — the cardinality/quantile layer a 100 TB
  * pipeline uses where exact computation needs an extra full shuffle:
  *
  *  - `approx_count_distinct` (HyperLogLog++): mergeable fixed-size state,
  *    so the partial/final aggregation tree never moves more than the
  *    sketch bytes per group — vs exact distinct's shuffle of every value.
  *  - `percentile_approx` (t-digest style): same mergeability argument for
  *    quantiles.
  *
  * Results are engine-specific (sketch internals differ across engines) so
  * these are spec-verified against exact ground truth with error bounds,
  * not DuckDB-oracled.
  */
object Sketches {

  /** Per-group approximate distinct counts alongside the relative error
    * target. `rsd` = HLL relative standard deviation (default 5%).
    */
  def distinctCounts(df: DataFrame, group: Column, value: Column,
      rsd: Double = 0.05): DataFrame =
    df.groupBy(group.as("grp"))
      .agg(approx_count_distinct(value, rsd).as("approx_nd"))

  /** Approximate quantiles per group (accuracy = 1/err tradeoff knob of
    * Spark's percentile_approx).
    */
  def quantiles(df: DataFrame, group: Column, value: Column,
      probs: Seq[Double], accuracy: Int = 10000): DataFrame = {
    val pArr = array(probs.map(lit): _*)
    df.groupBy(group.as("grp"))
      .agg(percentile_approx(value, pArr, lit(accuracy)).as("qs"))
  }

  /** Heavy hitters: groups holding at least `minShare` of all rows — the
    * skew-detection primitive feeding [[Salt]]'s salted joins. Fully lazy,
    * ONE scan of the input: the row total is the sum of the per-key counts
    * (broadcast back over the tiny aggregate), never a second `count()`
    * pass over the raw data. At extreme key cardinality swap the first
    * aggregation for a count-min sample.
    */
  def heavyHitters(df: DataFrame, key: Column,
      minShare: Double): DataFrame = {
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("t"))
    counts.crossJoin(broadcast(total))
      .filter(col("n") >= col("t") * minShare)
      .select(col("key"), col("n"), (col("n") / col("t")).as("share"))
  }
}
