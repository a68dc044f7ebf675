package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution statistics built scale-first.
  *
  * Spark's exact `percentile` aggregate buffers every group member in
  * executor memory — fine on test frames, an OOM hazard with wide groups
  * at corpus scale. When the measured column lives on a finite value grid
  * (integral counts, 2dp money, rounded scores — true of almost every
  * column a pipeline takes percentiles of), the same EXACT interpolated
  * result comes from a value-grid histogram: count per (group, value) — a
  * map-side-combined shuffle whose state is the number of DISTINCT values,
  * not rows — then a cumulative window over the grid to locate the (n-1)p
  * order statistics and a closed-form interpolation. Memory is bounded by
  * grid cardinality per group (the window sort spills); row count never
  * enters the bound.
  */
object Stats {

  /** Exact percentiles of `v` per `key` via the value-grid histogram.
    * `ps` = (output column name, fraction). NULL values are excluded (the
    * `percentile`-aggregate contract); a key whose `v` is entirely NULL is
    * simply absent (callers left-join from the key universe). Results are
    * rounded to 6dp — interpolation is double math and the last ulp of
    * `a + f*(b-a)` is not portable across engines.
    */
  def gridPercentiles(df: DataFrame, key: String, v: String,
      ps: Seq[(String, Double)]): DataFrame = {
    val hist = df.filter(col(v).isNotNull)
      .groupBy(col(key), col(v).as("val")).agg(count(lit(1)).as("cnt"))
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy(col(key)).orderBy(col("val"))))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col(key))))
    // rank of the lower/upper order statistic around position (n-1)p —
    // computed inside the aggregate (n is constant within a group)
    def rank1(p: Double): Column =
      floor((col("n") - 1).cast("double") * lit(p)) + 1
    val aggs = ps.flatMap { case (name, p) =>
      Seq(
        min(when(col("cum") >= rank1(p), col("val")))
          .cast("double").as(s"${name}__lo"),
        min(when(col("cum") >= rank1(p) + 1, col("val")))
          .cast("double").as(s"${name}__hi"))
    } :+ max(col("n")).as("n")
    val agg = cum.groupBy(col(key)).agg(aggs.head, aggs.tail: _*)
    val out = ps.foldLeft(agg) { case (acc, (name, p)) =>
      val pos = (col("n") - 1).cast("double") * lit(p)
      val f = pos - floor(pos).cast("double")
      // f = 0 must short-circuit: __hi is NULL at the top order statistic
      // and NULL * 0 would null the whole interpolation
      acc.withColumn(name, round(
        when(f === 0.0, col(s"${name}__lo"))
          .otherwise(col(s"${name}__lo") +
            f * (col(s"${name}__hi") - col(s"${name}__lo"))), 6))
    }
    out.select(col(key) +: ps.map { case (n, _) => col(n) }: _*)
  }

  /** Global (ungrouped) exact percentiles of `v`: one constant-key grid —
    * the single partition holds the HISTOGRAM (distinct values), never the
    * rows, so a corpus-wide median is one narrow broadcastable frame.
    */
  def globalPercentiles(df: DataFrame, v: String,
      ps: Seq[(String, Double)]): DataFrame =
    gridPercentiles(df.withColumn("__g", lit(1)), "__g", v, ps).drop("__g")
}
