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

  /** Deterministic KMV (k-minimum-values) distinct estimator: hash every
    * value through the engine-portable [[Sampling.hashBucket]] mix, keep
    * the k-th smallest distinct hash h_k per group, estimate
    * nd ≈ (k-1)·2^32 / h_k (exact count when the group has < k distinct
    * values). Unlike HLL the entire computation is reproducible on any
    * engine — the DuckDB oracle re-derives the identical estimate — while
    * keeping the sketch property that only k hashes per group matter.
    * This form materializes distinct (group, hash) pairs; the mergeable
    * low-shuffle variant for 100 TB remains `approx_count_distinct`
    * ([[distinctCounts]]) — KMV is the cross-engine-checkable counterpart.
    */
  def kmvDistinct(df: DataFrame, group: Column, value: Column,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, "KMV needs k >= 2")
    val hashed = df.select(group.as("grp"),
      Sampling.hashBucket(value).as("hv")).distinct()
    val w = Window.partitionBy("grp").orderBy("hv")
    hashed
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("nd", count(lit(1)).over(Window.partitionBy("grp")))
      .filter(col("rn") === least(lit(k.toLong), col("nd")))
      .select(col("grp"),
        when(col("nd") < k, col("nd"))
          .otherwise(floor(lit((k - 1).toDouble * 4294967296.0) /
            greatest(col("hv"), lit(1L))).cast("long"))
          .as("est_nd"))
  }

  /** ANSI-SQL text of [[kmvDistinct]] for the DuckDB oracle — one source
    * of truth with the engine so the estimates stay bit-identical.
    */
  def kmvDistinctSql(table: String, group: String, value: String,
      k: Int): String = s"""
    WITH h AS (SELECT DISTINCT $group AS grp,
                 ${Sampling.hashBucketSql(value)} AS hv FROM $table),
    r AS (SELECT grp, hv,
            row_number() OVER (PARTITION BY grp ORDER BY hv) AS rn,
            count(*) OVER (PARTITION BY grp) AS nd
          FROM h)
    SELECT grp, CASE WHEN nd < $k THEN nd
                ELSE CAST(floor(${k - 1} * 4294967296.0 /
                          greatest(hv, 1)) AS BIGINT) END AS est_nd
    FROM r WHERE rn = least($k, nd)"""

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
