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

  /** A5 — exact per-group kernel density on a fixed evaluation grid
    * (the reference's per-group KDE/distribution plots, re-expressed as
    * the data job that feeds them).
    *
    * Kernel choice is the cross-engine-exactness move: EPANECHNIKOV
    * (0.75·(1−u²) for |u|<1) is a POLYNOMIAL, so each row's kernel value
    * is bit-identical on any IEEE engine — unlike a Gaussian, whose
    * exp() differs in the last ulp across engines. The remaining hazard
    * is double-SUM order (addition is not associative across partition
    * layouts), so per-row kernel values are quantized to integer micros
    * (`floor(k·1e6 + 0.5)` — the q90 rule) and summed as BIGINT: the
    * aggregate is exact, partitioning-independent, and oracle-replayable
    * with no final round.
    *
    * Plan shape: one projection (grid explode, ×points) into ONE
    * map-side-combined aggregation keyed (group, x0) — every row
    * contributes to every grid point, so `count(*)` per cell IS the
    * group size and the density normalizer needs no second pass. NULL
    * values are excluded (the KDE contract); a NULL group key survives
    * as its own group. Grid/bandwidth should be binary-exact literals
    * (integral or k/2^m) so u is identical cross-engine.
    */
  def groupedKde(df: DataFrame, key: Column, v: Column, gridMin: Double,
      step: Double, points: Int, bandwidth: Double): DataFrame = {
    require(points >= 1 && step > 0 && bandwidth > 0,
      s"groupedKde: bad grid ($points points, step $step, h $bandwidth)")
    val u = (col("x0") - col("x")) / lit(bandwidth)
    // NaN excluded with NULLs: greatest(0, 1-u*u) is NaN for NaN input
    // (Spark orders NaN above all doubles) and the ANSI long cast of
    // floor(NaN) throws — one NaN row would kill the query otherwise.
    // Any oracle over non-clean data must pin the same exclusion.
    df.filter(v.isNotNull && !isnan(v))
      .select(key.as("grp"), v.as("x"))
      .select(col("grp"), col("x"),
        explode(sequence(lit(0), lit(points - 1))).as("gi"))
      .select(col("grp"), col("x"),
        (lit(gridMin) + col("gi").cast("double") * lit(step)).as("x0"))
      .select(col("grp"), col("x0"),
        floor(lit(0.75) * greatest(lit(0.0), lit(1.0) - u * u) *
          lit(1e6) + lit(0.5)).cast("long").as("kq"))
      .groupBy(col("grp"), col("x0"))
      .agg(
        (sum(col("kq")).cast("double") / lit(1e6) /
          (count(lit(1)).cast("double") * lit(bandwidth))).as("density"),
        count(lit(1)).as("n"))
  }

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
    * `nFor` names the row-count column backing each output (multi-column
    * variants carry one count per measured column; NULLs were excluded
    * per column, so the counts differ).
    */
  private def interpolate(agg: DataFrame, key: String,
      ps: Seq[(String, Double)],
      nFor: String => Column = _ => col("n")): DataFrame = {
    val out = ps.foldLeft(agg) { case (acc, (name, p)) =>
      val pos = (nFor(name) - 1).cast("double") * lit(p)
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

  /** [[gridPercentiles]] over SEVERAL measured columns in ONE scan and
    * ONE job: the columns are unpivoted to (key, cid, val) rows, the
    * value grid aggregates per (key, cid, val), the cumulative/total
    * windows share one (key, cid) partitioning, and every target's lo/hi
    * order statistics fall out of the SAME final aggregation — no
    * broadcast build, no second scan of the input, no key-universe
    * re-join (the fused selection shape the q20 oracle's single-CTE
    * chain expresses).
    *
    * NULL handling is inlined instead of re-joining a key universe: NULL
    * measurements keep their grid row but carry count 0, so a key whose
    * column is all-NULL still emits an output row (with NULL results for
    * that column) and the cumulative counts of real values are
    * untouched. Null grid rows sort FIRST in the cumulative window
    * (pinned) — with zero weight their position is count-neutral, and
    * the oracle never sees them (it filters NULLs and re-joins keys;
    * same result by construction).
    *
    * Scale bound: state per (key, cid) is the DISTINCT-value grid, never
    * rows — for integral counts and 2dp money the grid saturates at the
    * value RANGE, so the per-group single-task window is a bounded fixed
    * cost at any corpus size. For grids too fine for that bound (float
    * scores over a wide range) use [[selectionPercentilesMulti]], which
    * trades a second scan for never sorting more than one bucket.
    */
  def gridPercentilesMulti(df: DataFrame, key: String,
      specs: Seq[(String, Seq[(String, Double)])]): DataFrame = {
    require(specs.nonEmpty && specs.forall(_._2.nonEmpty),
      "gridPercentilesMulti: empty spec")
    val names = specs.flatMap(_._2.map(_._1))
    require(names.distinct.size == names.size,
      s"gridPercentilesMulti: duplicate output names in $names")
    val colArr = array(specs.zipWithIndex.map { case ((v, _), ci) =>
      struct(lit(ci).as("cid"), col(v).cast("double").as("val"))
    }: _*)
    val grid = df.select(col(key), explode(colArr).as("cv"))
      .groupBy(col(key), col("cv.cid").as("cid"), col("cv.val").as("val"))
      .agg(count(lit(1)).as("rows"))
      // NULL measurements are excluded from the percentile (the
      // `percentile`-aggregate contract) but keep the key alive
      .withColumn("cnt",
        when(col("val").isNotNull, col("rows")).otherwise(lit(0L)))
    // stage the windows on a KEY-only explicit repartition: hash(key)
    // satisfies both windows' (key, cid) clustering (key-subset
    // partitioning clusters the full key) AND the final groupBy(key),
    // so the rollup below plans exchange-free — one whole AQE stage
    // less than letting the planner insert a (key, cid) exchange here
    // and a (key) exchange there. Bytes moved are identical (the grid),
    // and the per-group single-task window property is unchanged.
    val np = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // BOTH window columns share one (partition, order) spec — the group
    // total uses an unbounded frame over the SAME ordered spec instead
    // of an order-less spec, so Spark plans a single WindowExec (one
    // pass over the sorted grid) rather than two stacked Window nodes
    val ordered = Window.partitionBy(col(key), col("cid"))
      .orderBy(col("val").asc_nulls_first)
    val cum = grid.repartition(np, col(key))
      .withColumn("cum", sum(col("cnt")).over(ordered))
      .withColumn("n", sum(col("cnt")).over(ordered.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)))
    def rank1(p: Double): Column =
      floor((col("n") - 1).cast("double") * lit(p)) + 1
    val aggs = specs.zipWithIndex.flatMap { case ((_, ps), ci) =>
      val inCid = col("cid") === lit(ci)
      ps.flatMap { case (name, p) =>
        Seq(
          min(when(inCid && col("cum") >= rank1(p), col("val")))
            .as(s"${name}__lo"),
          min(when(inCid && col("cum") >= rank1(p) + 1, col("val")))
            .as(s"${name}__hi"),
          // per-column row count (0 for an all-NULL column in the key)
          max(when(inCid, col("n"))).as(s"${name}__n"))
      }
    }
    val agg = cum.groupBy(col(key)).agg(aggs.head, aggs.tail: _*)
    interpolate(agg, key, specs.flatMap(_._2), name => col(s"${name}__n"))
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
      ps: Seq[(String, Double)], bucketWidth: Double): DataFrame =
    selectionPercentilesMulti(df, key, Seq((v, bucketWidth, ps)))

  /** [[selectionPercentiles]] over SEVERAL measured columns in ONE pair of
    * scans: the columns are unpivoted to (key, cid, bucket, val) rows
    * before pass A, so every column's bucket histogram rides the same
    * shuffle and every column's candidate buckets ride the same pass-B
    * re-scan — k columns × m percentiles cost two scans total, not 2k.
    * `specs` = (value column, bucketWidth, (output name, fraction)*);
    * output names must be globally unique. A group whose values for ONE
    * column are all NULL gets NULL for that column's outputs (it stays a
    * row if any other column has data — per-column row counts are carried
    * separately for exactly this reason).
    */
  def selectionPercentilesMulti(df: DataFrame, key: String,
      specs: Seq[(String, Double, Seq[(String, Double)])]): DataFrame = {
    require(specs.nonEmpty && specs.forall(_._3.nonEmpty),
      "selectionPercentilesMulti: empty spec")
    require(specs.forall(_._2 > 0),
      "selectionPercentilesMulti: bucketWidth must be > 0")
    val names = specs.flatMap(_._3.map(_._1))
    require(names.distinct.size == names.size,
      s"selectionPercentilesMulti: duplicate output names in $names")
    // unpivot: bucket is computed per column BEFORE the explode so each
    // column keeps its own width without a cid dispatch downstream
    val colArr = array(specs.zipWithIndex.map { case ((v, w, _), ci) =>
      val value = col(v).cast("double")
      struct(lit(ci).as("cid"), floor(value / lit(w)).as("b"),
        value.as("val"))
    }: _*)
    val rows = df.select(col(key), explode(colArr).as("cv"))
      .filter(col("cv.val").isNotNull)
      .select(col(key), col("cv.cid").as("cid"), col("cv.b").as("b"),
        col("cv.val").as("val"))
    // pass A: bucket histogram + per-(group, column) cumulative counts
    val buck = rows.groupBy(col(key), col("cid"), col("b"))
      .agg(count(lit(1)).as("bcnt"))
      .withColumn("bcum", sum(col("bcnt")).over(
        Window.partitionBy(col(key), col("cid")).orderBy(col("b"))))
      .withColumn("n", sum(col("bcnt")).over(
        Window.partitionBy(col(key), col("cid"))))
    // every target rank of every column in ONE pass — the rank array is
    // selected by cid (same struct type per branch, so one when-chain)
    def ranksOf(ps: Seq[(String, Double)]): Column =
      array(ps.flatMap { case (name, p) =>
        def r1: Column = floor((col("n") - 1).cast("double") * lit(p))
          .cast("long") + 1
        Seq(struct(lit(s"${name}__lo").as("tag"), r1.as("r")),
          struct(lit(s"${name}__hi").as("tag"), (r1 + 1).as("r")))
      }: _*)
    val targetArr = specs.zipWithIndex.tail
      .foldLeft(when(col("cid") === lit(0), ranksOf(specs.head._3))) {
        case (acc, ((_, _, ps), ci)) =>
          acc.when(col("cid") === lit(ci), ranksOf(ps))
      }
    val targets = buck
      .select(col(key).as("__tk"), col("cid").as("__tc"),
        col("b").as("__tb"), (col("bcum") - col("bcnt")).as("prior"),
        col("bcum"), col("n"), explode(targetArr).as("t"))
      .filter(col("bcum") >= col("t.r") && col("prior") < col("t.r"))
      .select(col("__tk"), col("__tc"), col("__tb"),
        col("t.tag").as("tag"), col("t.r").as("r"), col("prior"), col("n"))
    // pass B: only rows in a target bucket survive the broadcast join;
    // the in-bucket histogram is tiny by construction. Two aggregation
    // levels, no window: level 1 map-side-combines bucket rows into the
    // in-bucket value histogram (r/prior/n are constant per (group, tag) —
    // max() just carries them); level 2 collects each group's histograms
    // (memory = the target buckets' grids, the same bound the window
    // formulation had) and a cumulative HOF walk locates each in-bucket
    // order statistic — one exchange fewer and no per-group sort pass vs
    // cumsum-window + re-aggregate.
    val cand = rows
      .join(broadcast(targets),
        col(key) <=> col("__tk") && col("cid") === col("__tc") &&
          col("b") === col("__tb"))
      .groupBy(col(key), col("tag"), col("val"))
      .agg(count(lit(1)).as("cnt"), max(col("r")).as("r"),
        max(col("prior")).as("prior"), max(col("n")).as("n"))
    // sort_array orders by (tag, val): within one tag the entries are the
    // ascending value grid of that target's bucket
    val perKey = cand.groupBy(col(key))
      .agg(sort_array(collect_list(struct(col("tag"), col("val"),
        col("cnt"), col("r"), col("prior"), col("n")))).as("ents"))
    // first value whose running in-bucket count reaches rank r − prior;
    // empty tag slice (that column all-NULL in the group) → NULL
    def pick(tag: String): Column = aggregate(
      filter(col("ents"), e => e("tag") === lit(tag)),
      struct(lit(0L).as("cum"), lit(null).cast("double").as("v")),
      (acc, e) => struct(
        (acc("cum") + e("cnt")).as("cum"),
        coalesce(acc("v"),
          when(e("prior") + acc("cum") + e("cnt") >= e("r"),
            e("val").cast("double"))).as("v")),
      a => a("v"))
    def nOf(name: String): Column =
      get(filter(col("ents"), e => e("tag") === lit(s"${name}__lo")),
        lit(0))("n")
    val wideCols = names.flatMap { name => Seq(
      pick(s"${name}__lo").as(s"${name}__lo"),
      pick(s"${name}__hi").as(s"${name}__hi"),
      nOf(name).as(s"${name}__n"))
    }
    val wide = perKey.select(col(key) +: wideCols: _*)
    interpolate(wide, key, specs.flatMap(_._3),
      name => col(s"${name}__n"))
  }

  /** Global (ungrouped) exact percentiles of `v`: one constant-key grid —
    * the single partition holds the HISTOGRAM (distinct values), never the
    * rows, so a corpus-wide median is one narrow broadcastable frame.
    */
  def globalPercentiles(df: DataFrame, v: String,
      ps: Seq[(String, Double)]): DataFrame =
    gridPercentiles(df.withColumn("__g", lit(1)), "__g", v, ps).drop("__g")
}
