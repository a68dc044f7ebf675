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

  private val Knuth = 2654435761L // Knuth multiplicative hash constant
  private val M = 4294967296L     // 2^32

  /** Uniform bucket in [0, 2^32) from an integer key — plain long
    * arithmetic (max key ~2^33 stays far below ANSI overflow).
    */
  def hashBucket(key: Column): Column =
    pmod(key.cast("long") * lit(Knuth), lit(M))

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
