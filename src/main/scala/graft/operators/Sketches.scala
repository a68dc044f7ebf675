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

  /** Per-group EXACT + approximate distinct of an integral key in ONE
    * fact-wide aggregate (q70's shape, r12). Aggregates on
    * (group, bitmap-bucket(key)): exact distinct via a 4 KB bitmap per
    * bucket — buckets partition the key domain, so per-bucket popcounts
    * SUM exactly (the q49 bucketed-bitmap idea) — and approximate distinct
    * via a per-bucket DataSketches HLL (`hll_sketch_agg`) whose registers
    * UNION exactly across buckets: the mergeable-sketch layout a
    * 1000-executor run needs. Everything after the single fact exchange is
    * bucket-sized. vs the r11 dedup-first form (distinct() the (grp, key)
    * pairs, then count + HLL): no per-distinct-pair shuffle at all —
    * sf10 solo 9.8 s → 1.6 s, parity with DuckDB.
    *
    * Contracts: NULL keys set no bit and enter no sketch (excluded, like
    * count(DISTINCT)); an all-NULL-key group yields (0, 0.0); a NULL group
    * survives (no join anywhere). Output: (grpName, exact_nd BIGINT,
    * approx_nd DOUBLE). For scattered 64-bit hash domains prefer
    * [[distinctCounts]] + a separate exact pass — each key would occupy
    * its own 4 KB bucket here (see [[DistinctCounts]] scaladoc).
    */
  def groupedDistinctExactApprox(df: DataFrame, group: Column, key: Column,
      grpName: String = "grp", lgK: Int = 12): DataFrame = {
    val lvl1 = df
      .select(group.as("__grp"), key.as("__k"))
      .select(col("__grp"),
        expr("bitmap_bucket_number(__k)").as("__b"),
        expr("bitmap_bit_position(__k)").as("__p"),
        col("__k"))
      .groupBy(col("__grp"), col("__b"))
      .agg(expr("bitmap_count(bitmap_construct_agg(__p))").as("__cnt"),
        expr(s"hll_sketch_agg(__k, $lgK)").as("__sk"))
    lvl1.groupBy(col("__grp").as(grpName))
      .agg(coalesce(sum(col("__cnt")), lit(0L)).as("exact_nd"),
        coalesce(
          expr("try_cast(hll_sketch_estimate(hll_union_agg(__sk, true)) " +
            "AS DOUBLE)"), lit(0.0)).as("approx_nd"))
  }

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
    *
    * r12 shape: ONE [[graft.functions.KmvMinsAgg]] typed aggregate —
    * bounded mergeable state (≤ k longs per group per partition enters
    * the shuffle), replacing the distinct-then-window form that shuffled
    * the whole distinct (group, hash) set and re-exchanged it for the
    * rank window (2 exchanges → 1, and the exchanged volume drops from
    * the distinct value set to k longs — the same mergeability argument
    * as HLL, but cross-engine reproducible). NULL values contribute no
    * element (the COUNT(DISTINCT) contract, pinned in the oracle's WHERE;
    * the windowed form ranked NULL hashes nulls-first on Spark and
    * nulls-last on DuckDB — a latent divergence this form removes).
    * [[kmvDistinctWindowed]] stays as the spec's equivalence oracle.
    */
  def kmvDistinct(df: DataFrame, group: Column, value: Column,
      k: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.ExprBridge
    require(k >= 2, "KMV needs k >= 2")
    val mins = ExprBridge.column(graft.functions.KmvMinsAgg(
      ExprBridge.expr(Sampling.hashBucket(value)), k)
      .toAggregateExpression())
    df.filter(value.isNotNull)
      .groupBy(group.as("grp"))
      .agg(mins.as("__mins"))
      .select(col("grp"),
        when(size(col("__mins")) < k, size(col("__mins")).cast("long"))
          .otherwise(floor(lit((k - 1).toDouble * 4294967296.0) /
            greatest(element_at(col("__mins"), k), lit(1L))).cast("long"))
          .as("est_nd"))
  }

  /** The composed distinct→window spelling of [[kmvDistinct]] — kept as
    * the equivalence oracle in `SketchesSpec` (NULL values pre-filtered to
    * match the pinned contract).
    */
  def kmvDistinctWindowed(df: DataFrame, group: Column, value: Column,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, "KMV needs k >= 2")
    val hashed = df.filter(value.isNotNull).select(group.as("grp"),
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
                 ${Sampling.hashBucketSql(value)} AS hv FROM $table
               WHERE $value IS NOT NULL),
    r AS (SELECT grp, hv,
            row_number() OVER (PARTITION BY grp ORDER BY hv) AS rn,
            count(*) OVER (PARTITION BY grp) AS nd
          FROM h)
    SELECT grp, CASE WHEN nd < $k THEN nd
                ELSE CAST(floor(${k - 1} * 4294967296.0 /
                          greatest(hv, 1)) AS BIGINT) END AS est_nd
    FROM r WHERE rn = least($k, nd)"""

  /** Portable HyperLogLog: the classic Flajolet estimator computed over
    * [[Dedup.portableHash64]] (a 60-bit md5 fold both engines spell the
    * same way), so — unlike `approx_count_distinct`, whose HLL++ register
    * layout is engine-private — the WHOLE sketch pipeline (bucket, rho,
    * register max, harmonic mean, linear-counting fallback) is
    * reproducible in ANSI SQL and the DuckDB oracle re-derives the
    * bit-identical estimate ([[hllPortableSql]] is generated from the
    * same constants).
    *
    * Layout: top `p` hash bits pick one of m=2^p registers; rho = position
    * of the first set bit among the remaining 60-p bits (all-zero tail =
    * 60-p+1). The register relation is ONE shuffle of at most m rows per
    * group (map-side partial max), and the per-group state the final
    * aggregate moves is m longs — the mergeability that makes HLL the
    * 100 TB cardinality primitive. The harmonic sum is kept EXACT by
    * scaling 2^-rho to the integer 2^(60-p+1-rho) (sum < 2^62, no
    * overflow, no float accumulation order to disagree on); the only
    * floating-point steps are one division plus the documented
    * linear-counting `ln`, and the result is rounded to an integer so a
    * last-ulp libm difference cannot surface.
    *
    * NULL values are excluded (a NULL contributes no element — the same
    * contract as COUNT(DISTINCT)). `value` is hashed through its string
    * form so both engines agree on the bytes.
    */
  def hllPortable(df: DataFrame, group: Column, value: Column,
      p: Int = 8): DataFrame =
    hllEstimateFromRegs(hllRegisters(df, group, value, p), p)

  /** The (grp, bucket, mj) register relation of the portable HLL — one
    * scan, one m-bounded shuffle (map-side partial max). Registers are
    * the MERGEABLE form: element-wise max of two sides' registers is the
    * sketch of their union, which is what [[hllJoinPreflight]] exploits.
    */
  private def hllRegisters(df: DataFrame, group: Column, value: Column,
      p: Int): DataFrame = {
    require(p >= 4 && p <= 14, s"hllPortable: p must be in [4,14], got $p")
    val remBits = 60 - p
    // stage the hash as an attribute: bucket and rho both read it, and an
    // inlined md5+conv would otherwise be evaluated twice per row
    df.filter(value.isNotNull)
      .select(group.as("grp"),
        Dedup.portableHash64(value.cast("string")).as("h"))
      .select(col("grp"), shiftright(col("h"), remBits).as("bucket"),
        col("h").bitwiseAND(lit((1L << remBits) - 1)).as("rem"))
      .select(col("grp"), col("bucket"),
        when(col("rem") === 0, lit(remBits + 1))
          .otherwise(lit(remBits + 1) - length(bin(col("rem")))).as("rho"))
      .groupBy(col("grp"), col("bucket"))
      .agg(max(col("rho")).as("mj"))
  }

  /** (grp, nd_est) from a register relation — the estimate step of
    * [[hllPortable]], shared with the merged-register path.
    */
  private def hllEstimateFromRegs(regs: DataFrame, p: Int): DataFrame = {
    val m = 1 << p
    val remBits = 60 - p
    val scale = 1L << (remBits + 1)
    // numerator alpha_m * m^2 * 2^(remBits+1) as ONE Scala double so the
    // SQL twin embeds the identical literal (round-trip toString)
    val numer = hllNumerator(p)
    val perGroup = regs.groupBy(col("grp")).agg(
      sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${remBits + 1} - mj)"))
        .as("s_present"),
      count(lit(1)).as("nb"))
    val v = lit(m.toLong) - col("nb")
    val sTot = col("s_present") + v * lit(scale)
    val estRaw = lit(numer) / sTot.cast("double")
    val est = when(estRaw <= lit(2.5 * m) && v > 0,
      lit(m.toDouble) * log(lit(m.toDouble) / v.cast("double")))
      .otherwise(estRaw)
    perGroup.select(col("grp"),
      floor(est + lit(0.5)).cast("long").as("nd_est"))
  }

  /** Join pre-flight cardinality estimation: ONE scan of each side builds
    * its HLL registers; the union sketch is the element-wise register
    * max; the key-overlap estimate follows by inclusion–exclusion
    * (clamped at 0 — estimates can cross). The planner-aid readout that
    * decides broadcast vs shuffle vs bloom-prefilter BEFORE touching
    * 100 TB: every relation after the two m-bounded register aggregates
    * is sketch-sized.
    *
    * Returns one row: (n_left_est, n_right_est, union_est, inter_est).
    */
  def hllJoinPreflight(left: DataFrame, leftKey: Column,
      right: DataFrame, rightKey: Column, p: Int = 8): DataFrame = {
    // cached: each side's registers feed its own estimate AND the merged
    // sketch (tiny: <= 2^p rows)
    val rl = hllRegisters(left, lit("L"), leftKey, p).cache()
    val rr = hllRegisters(right, lit("R"), rightKey, p).cache()
    val merged = rl.unionAll(rr)
      .select(lit("U").as("grp"), col("bucket"), col("mj"))
      .groupBy(col("grp"), col("bucket")).agg(max(col("mj")).as("mj"))
    val ests = hllEstimateFromRegs(rl.unionAll(rr).unionAll(merged), p)
    ests.groupBy().agg(
        max(when(col("grp") === "L", col("nd_est"))).as("n_left_est"),
        max(when(col("grp") === "R", col("nd_est"))).as("n_right_est"),
        max(when(col("grp") === "U", col("nd_est"))).as("union_est"))
      .select(col("n_left_est"), col("n_right_est"), col("union_est"),
        greatest(col("n_left_est") + col("n_right_est") - col("union_est"),
          lit(0L)).as("inter_est"))
  }

  /** ANSI-SQL text of [[hllPortable]] for the DuckDB oracle — generated
    * from the same p/m/alpha constants so the two engines cannot drift.
    */
  def hllPortableSql(table: String, group: String, value: String,
      p: Int = 8): String = {
    val m = 1 << p
    val remBits = 60 - p
    val scale = 1L << (remBits + 1)
    val numer = hllNumerator(p)
    s"""
    WITH h AS (
      SELECT $group AS grp,
             CAST('0x' || substr(md5(CAST($value AS VARCHAR)), 1, 15)
                  AS BIGINT) AS h
      FROM $table WHERE $value IS NOT NULL),
    rho AS (
      SELECT grp, h >> $remBits AS bucket,
             CASE WHEN (h & ${(1L << remBits) - 1}) = 0 THEN ${remBits + 1}
                  ELSE ${remBits + 1} -
                       length(bin(h & ${(1L << remBits) - 1})) END AS rho
      FROM h),
    regs AS (
      SELECT grp, bucket, max(rho) AS mj FROM rho GROUP BY grp, bucket),
    agg AS (
      SELECT grp,
             sum(CAST(1 AS BIGINT) << (${remBits + 1} - mj)) AS s_present,
             count(*) AS nb
      FROM regs GROUP BY grp)
    SELECT grp,
           CAST(floor(
             CASE WHEN ($numer /
                        CAST(s_present + ($m - nb) * $scale AS DOUBLE))
                         <= ${2.5 * m}
                       AND ($m - nb) > 0
                  THEN $m.0 * ln($m.0 / CAST($m - nb AS DOUBLE))
                  ELSE $numer /
                       CAST(s_present + ($m - nb) * $scale AS DOUBLE)
             END + 0.5) AS BIGINT) AS nd_est
    FROM agg"""
  }

  /** ANSI-SQL twin of [[hllJoinPreflight]] — registers per side, merged
    * union registers, and the identical estimate formula, all generated
    * from the same constants.
    */
  def hllJoinPreflightSql(leftTable: String, leftKey: String,
      rightTable: String, rightKey: String, p: Int = 8): String = {
    val m = 1 << p
    val remBits = 60 - p
    val scale = 1L << (remBits + 1)
    val numer = hllNumerator(p)
    def regs(name: String, table: String, key: String) = s"""
      $name AS (
        SELECT h >> $remBits AS bucket,
               max(CASE WHEN (h & ${(1L << remBits) - 1}) = 0
                        THEN ${remBits + 1}
                        ELSE ${remBits + 1} -
                             length(bin(h & ${(1L << remBits) - 1})) END)
                 AS mj
        FROM (SELECT CAST('0x' || substr(md5(CAST($key AS VARCHAR)), 1, 15)
                     AS BIGINT) AS h
              FROM $table WHERE $key IS NOT NULL)
        GROUP BY 1)"""
    def est(name: String, regsName: String) = s"""
      $name AS (
        SELECT CAST(floor(
          CASE WHEN ($numer /
                     CAST(s_present + ($m - nb) * $scale AS DOUBLE))
                      <= ${2.5 * m}
                    AND ($m - nb) > 0
               THEN $m.0 * ln($m.0 / CAST($m - nb AS DOUBLE))
               ELSE $numer /
                    CAST(s_present + ($m - nb) * $scale AS DOUBLE)
          END + 0.5) AS BIGINT) AS nd
        FROM (SELECT sum(CAST(1 AS BIGINT) << (${remBits + 1} - mj))
                       AS s_present,
                     count(*) AS nb
              FROM $regsName))"""
    s"""
    WITH ${regs("rl", leftTable, leftKey)},
    ${regs("rr", rightTable, rightKey)},
    ru AS (
      SELECT bucket, max(mj) AS mj
      FROM (SELECT * FROM rl UNION ALL SELECT * FROM rr)
      GROUP BY bucket),
    ${est("el", "rl")},
    ${est("er", "rr")},
    ${est("eu", "ru")}
    SELECT el.nd AS n_left_est, er.nd AS n_right_est, eu.nd AS union_est,
           greatest(el.nd + er.nd - eu.nd, 0) AS inter_est
    FROM el, er, eu"""
  }

  /** alpha_m * m^2 * 2^(60-p+1): the shared double constant of
    * [[hllPortable]]/[[hllPortableSql]].
    */
  private def hllNumerator(p: Int): Double = {
    val m = 1 << p
    (0.7213 / (1 + 1.079 / m)) * m * m * (1L << (60 - p + 1)).toDouble
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
