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
    interpolate(agg, key, ps)
  }

  /** Closed-form linear interpolation between the bracketing order
    * statistics `name__lo`/`name__hi` at fraction p of (n-1) — the
    * `percentile` contract — rounded to 6dp for cross-engine parity.
    */
  private def interpolate(agg: DataFrame, key: String,
      ps: Seq[(String, Double)]): DataFrame = {
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

  /** Exact percentiles by two-pass distributed SELECTION — the shape that
    * survives value grids too fine for [[gridPercentiles]] (2dp money over
    * a wide range, float scores): that operator's cumulative window puts
    * each group in ONE partition, a single-task sort of the whole grid —
    * the straggler at corpus scale.
    *
    * Pass A aggregates counts per (group, coarse bucket) — buckets are
    * `floor(value / bucketWidth)`, so the shuffle moves only the bucket
    * histogram, and the per-group cumulative window runs over buckets,
    * not values. The bucket that CONTAINS each target order statistic
    * (rank `floor((n-1)p)+1` and its successor) falls out of the bucket
    * cumsum; those few (group, bucket, rank) targets broadcast back.
    * Pass B re-scans the input, keeps only rows landing in a target
    * bucket (~n/buckets rows), and locates the exact in-bucket order
    * statistic with a histogram + cumsum over that small remainder. No
    * stage ever sorts more than one bucket's distinct values in a task,
    * and nothing buffers a group: memory is bounded by bucket count per
    * group (pass A) and one bucket's grid (pass B), never by n.
    *
    * Same contract as [[gridPercentiles]]: NULLs excluded, all-NULL
    * groups absent, results rounded to 6dp. Pick `bucketWidth` so a
    * group spans ≫ 1 and ≪ n buckets; correctness holds for ANY positive
    * width — a degenerate width only degrades to pass-B doing the
    * gridPercentiles amount of work.
    */
  def selectionPercentiles(df: DataFrame, key: String, v: String,
      ps: Seq[(String, Double)], bucketWidth: Double): DataFrame = {
    require(ps.nonEmpty, "selectionPercentiles: no percentiles requested")
    require(bucketWidth > 0, "selectionPercentiles: bucketWidth must be > 0")
    val rows = df.filter(col(v).isNotNull)
      .select(col(key), col(v).cast("double").as("val"))
    def bucketOf(c: Column): Column = floor(c / lit(bucketWidth))
    // pass A: bucket histogram + per-group cumulative bucket counts
    val buck = rows.groupBy(col(key), bucketOf(col("val")).as("b"))
      .agg(count(lit(1)).as("bcnt"))
      .withColumn("bcum", sum(col("bcnt")).over(
        Window.partitionBy(col(key)).orderBy(col("b"))))
      .withColumn("n", sum(col("bcnt")).over(Window.partitionBy(col(key))))
    // every target rank in ONE pass (union would re-aggregate per target)
    val targetArr = array(ps.flatMap { case (name, p) =>
      def r1: Column = floor((col("n") - 1).cast("double") * lit(p))
        .cast("long") + 1
      Seq(struct(lit(s"${name}__lo").as("tag"), r1.as("r")),
        struct(lit(s"${name}__hi").as("tag"), (r1 + 1).as("r")))
    }: _*)
    val targets = buck
      .select(col(key).as("__tk"), col("b").as("__tb"),
        (col("bcum") - col("bcnt")).as("prior"), col("bcum"), col("n"),
        explode(targetArr).as("t"))
      .filter(col("bcum") >= col("t.r") && col("prior") < col("t.r"))
      .select(col("__tk"), col("__tb"), col("t.tag").as("tag"),
        col("t.r").as("r"), col("prior"), col("n"))
    // pass B: only rows in a target bucket survive the broadcast join;
    // the in-bucket histogram + cumsum is tiny by construction
    val cand = rows
      .join(broadcast(targets),
        col(key) <=> col("__tk") && bucketOf(col("val")) === col("__tb"))
      .groupBy(col(key), col("tag"), col("r"), col("prior"), col("n"),
        col("val"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("lcum", sum(col("cnt")).over(
        Window.partitionBy(col(key), col("tag")).orderBy(col("val"))))
    val vals = cand.groupBy(col(key), col("tag"))
      .agg(max(col("n")).as("n"),
        min(when(col("prior") + col("lcum") >= col("r"), col("val")))
          .cast("double").as("tval"))
    val wide = vals.groupBy(col(key)).agg(
      max(col("n")).as("n"),
      ps.flatMap { case (name, _) => Seq(
        min(when(col("tag") === s"${name}__lo", col("tval")))
          .as(s"${name}__lo"),
        min(when(col("tag") === s"${name}__hi", col("tval")))
          .as(s"${name}__hi"))
      }: _*)
    interpolate(wide, key, ps)
  }

  /** Global (ungrouped) exact percentiles of `v`: one constant-key grid —
    * the single partition holds the HISTOGRAM (distinct values), never the
    * rows, so a corpus-wide median is one narrow broadcastable frame.
    */
  def globalPercentiles(df: DataFrame, v: String,
      ps: Seq[(String, Double)]): DataFrame =
    gridPercentiles(df.withColumn("__g", lit(1)), "__g", v, ps).drop("__g")
}
