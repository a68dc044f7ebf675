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
  private val M = 4294967296L   // 2^32

  /** Uniform bucket in [0, 2^32) from an integer key. The key is reduced
    * mod 2^32 BEFORE the multiply so the intermediate product is at most
    * (2^32-1)·K31 < 2^62 — no ANSI overflow for any long key (a raw
    * key·constant multiply would throw for snowflake-scale ids).
    */
  def hashBucket(key: Column): Column =
    pmod(pmod(key.cast("long"), lit(M)) * lit(K31), lit(M))

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
}
