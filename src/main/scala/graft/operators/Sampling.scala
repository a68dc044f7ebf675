package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling.
  *
  * `df.stat.sampleBy` (the reference's `groupby().sample(frac)`,
  * notebooks/DiabetesSQL.ipynb:3220-3223) draws from an engine-specific
  * RNG: the selected set changes across engines and is only stable within
  * one Spark version — unusable as a cross-engine oracle and fragile for
  * reproducible 100 TB pipeline runs (a retried partition must select the
  * SAME rows). The scale-correct form hashes a stable business key to a
  * uniform fraction and keeps rows under the stratum's rate: reproducible
  * on any engine, any partitioning, any retry — and embarrassingly
  * parallel (pure per-row predicate, no state).
  */
object Sampling {

  private val K31 = 1327217885L // 31-bit multiplicative hash constant
  private val K2 = 1540483477L  // second odd mix constant (31-bit)
  private val M = 4294967296L   // 2^32

  /** Uniform bucket in [0, 2^32) from an integer key.
    *
    * Stages (each expressible identically in ANSI SQL, so a DuckDB oracle
    * can reproduce the selected set bit-for-bit):
    *   1. fold the high word: key XOR (key >> 32) — two 64-bit ids that
    *      are congruent mod 2^32 (e.g. snowflake ids sharing low bits) no
    *      longer co-sample deterministically;
    *   2. reduce mod 2^32 BEFORE the multiply so the intermediate product
    *      is at most (2^32-1)·K < 2^63 — no ANSI overflow for any key;
    *   3. multiply-mod by K31, then XOR-shift (>>16) and multiply-mod by
    *      K2 — the second round gives the high bits avalanche a single
    *      odd-constant multiply lacks, so structured key spaces
    *      (sequential ids, fixed strides) don't bias per-stratum rates.
    */
  def hashBucket(key: Column): Column = {
    val folded = key.cast("long").bitwiseXOR(shiftright(key.cast("long"), 32))
    val r1 = pmod(pmod(folded, lit(M)) * lit(K31), lit(M))
    pmod(r1.bitwiseXOR(shiftright(r1, 16)) * lit(K2), lit(M))
  }

  /** The DuckDB/ANSI-SQL text of [[hashBucket]] over column `k` — kept in
    * one place so every oracle that samples agrees with the engine.
    */
  def hashBucketSql(k: String): String = {
    // cast to BIGINT so the >>32 fold matches hashBucket's 64-bit
    // semantics even when the oracle-side column is 32-bit INTEGER
    val k64 = s"CAST($k AS BIGINT)"
    val folded = s"xor($k64, $k64 >> 32)"
    val r1 = s"((($folded % 4294967296 + 4294967296) % 4294967296) * 1327217885) % 4294967296"
    s"((xor($r1, ($r1) >> 16)) * 1540483477) % 4294967296"
  }

  /** WEIGHTED Bernoulli sample: keep each row independently with
    * probability min(1, num·w/den) — "sample documents proportional to
    * their token mass", the size-biased draw a mixture pipeline uses so
    * one giant document can't ride in on the same coin flip as a
    * one-liner. The decision is a PURE INTEGER comparison,
    * `hashBucket(key)·den < min(w·num, den)·2^32`, so any engine
    * reproduces the selected set exactly (the clamp also bounds every
    * product: hash·den < 2^62 for den ≤ 2^30, and the right side at
    * (den+num)·2^32). NULL weights never select.
    *
    * Scale shape: a stateless per-row predicate on a map-side hash — no
    * shuffle, no RNG state, retry/partitioning-independent.
    */
  def weightedBernoulli(df: DataFrame, key: Column, weight: Column,
      num: Long, den: Long): DataFrame = {
    require(num >= 1 && num <= (1L << 20),
      s"weightedBernoulli: need 1 <= num <= 2^20, got $num")
    require(den >= 1 && den <= (1L << 30),
      s"weightedBernoulli: need 1 <= den <= 2^30, got $den")
    // inner clamp BEFORE the multiply, from BOTH sides: a hostile
    // near-±2^63 weight must saturate, not ANSI-overflow; 0 <= w <= den
    // bounds every product (w·num <= 2^50, and a negative weight would
    // otherwise survive the upper clamp and overflow the multiply)
    df.filter(hashBucket(key) * lit(den) <
      least(least(greatest(coalesce(weight, lit(0L)), lit(0L)),
        lit(den)) * lit(num), lit(den)) * lit(M))
  }

  /** Keep rows whose hash bucket falls under the per-stratum rate.
    * `rates`: stratum value -> sampling fraction in [0,1].
    */
  def stratified(df: DataFrame, key: Column, stratum: Column,
      rates: Map[String, Double]): DataFrame = {
    val cut = rates.foldLeft(lit(-1L)) { case (acc, (k, r)) =>
      when(stratum === k, lit((r * M).toLong)).otherwise(acc)
    }
    df.filter(hashBucket(key) < cut)
  }

  /** Proportional-allocation stratified sample: apportion a GLOBAL doc
    * budget across strata proportional to each stratum's mass (token
    * count) with Hamilton's largest-remainder method, then take each
    * stratum's allocation deterministically by md5 hash priority (the
    * q87 selection). The full "sample N documents, languages weighted by
    * their token share" step of a mixture pipeline, end to end.
    *
    * Every apportionment decision is INTEGER arithmetic — floor =
    * `(budget·mass) DIV total`, remainder = `(budget·mass) MOD total`,
    * leftover seats to the largest remainders (ties: stratum ASC, nulls
    * last) — so any engine reproduces the allocation exactly; no
    * floating-point rate ever rounds differently. Requires
    * budget · total-mass < 2^63 (ANSI throws on the overflow rather than
    * corrupting the allocation; lift the products to DECIMAL(38,0) for
    * corpora past ~9e18/budget tokens).
    *
    * Scale shape: the mass aggregate is one shuffle with map-side
    * partials; the apportionment runs on the STRATUM-cardinality frame
    * (its global window sorts #strata rows, not documents); selection is
    * [[TopK.perGroup]]'s bounded heap at k = budget (an allocation can
    * never exceed the global budget, proven by Σfloor ≤ budget), gated by
    * the broadcast allocation row. NULL strata are excluded BEFORE the
    * apportionment — otherwise unclassified documents would silently
    * absorb budget seats that then evaporate at the allocation join.
    */
  def proportionalSample(docs: DataFrame, id: Column, stratum: Column,
      mass: Column, budget: Int): DataFrame = {
    require(budget >= 1, s"proportionalSample: budget must be >= 1, got $budget")
    import org.apache.spark.sql.expressions.Window
    val rows = docs.select(id.as("doc_id"), stratum.as("stratum"),
      mass.as("__m")).filter(col("stratum").isNotNull)
    val massBy = rows.groupBy("stratum")
      .agg(coalesce(sum(col("__m")), lit(0L)).as("toks"))
    val tot = massBy
      .agg(greatest(coalesce(sum(col("toks")), lit(0L)), lit(1L)).as("tot"))
    val base = massBy.crossJoin(broadcast(tot))
      .withColumn("fl", expr(s"(${budget}L * toks) DIV tot"))
      .withColumn("rem", pmod(lit(budget.toLong) * col("toks"), col("tot")))
    val sfl = base.agg(coalesce(sum(col("fl")), lit(0L)).as("sfl"))
    val alloc = base.crossJoin(broadcast(sfl))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("rem").desc, col("stratum").asc_nulls_last)))
      .select(col("stratum"),
        (col("fl") + when(col("rn") <= lit(budget.toLong) - col("sfl"),
          lit(1L)).otherwise(lit(0L))).as("alloc"))
    val pri = md5(col("doc_id").cast("string").cast("binary"))
    TopK.perGroup(rows.select(col("doc_id"), col("stratum")),
        Seq("stratum"), struct(pri.as("p"), col("doc_id").as("i")),
        payload = Seq("doc_id"), k = budget, largest = false)
      .join(broadcast(alloc), Seq("stratum"))
      .filter(col("rank") <= col("alloc"))
      .select(col("doc_id"), col("stratum"), col("rank").cast("long").as("rk"),
        col("alloc"))
  }
}
