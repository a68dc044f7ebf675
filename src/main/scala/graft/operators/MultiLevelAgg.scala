package graft.operators

import org.apache.spark.sql.{Column, DataFrame, RelationalGroupedDataset}
import org.apache.spark.sql.functions._

/** Two-phase ROLLUP / CUBE / GROUPING SETS.
  *
  * Spark plans multi-level aggregation as `Expand` UNDER the aggregate:
  * every input row is replicated once per grouping set, and only then does
  * the partial aggregate reduce — a CUBE over two keys pushes 4× the scan
  * through the hash aggregate, and at 100 TB that multiplier is pure wasted
  * CPU and (for high-cardinality sets) shuffle. DuckDB's grouping-sets
  * executor reduces first, which is why the single-phase Spark form
  * measured ~20× slower at sf1.
  *
  * For ALGEBRAIC aggregates (count/sum/min/max — anything with a merge
  * function) the fix is a textbook two-phase plan:
  *
  *   1. aggregate ONCE at the finest granularity (the union of all grouping
  *      columns) — one scan, map-side combined, output rows = distinct key
  *      combinations;
  *   2. run the built-in rollup/cube/groupingSets over that tiny
  *      pre-aggregate, merging partials (`count → sum`, `sum → sum`,
  *      `min → min`, `max → max`).
  *
  * Results are IDENTICAL to the single-phase form — data NULLs in group
  * keys survive phase 1 as ordinary group values, so `grouping_id()` and
  * subtotal-NULL semantics in phase 2 are unchanged (the q48/q59/q77
  * oracles certify this row-for-row). Expand still runs, but over the
  * pre-aggregated relation (key-cardinality rows), never the corpus.
  *
  * Not applicable to holistic aggregates (exact distinct counts,
  * percentiles) — those need the raw rows at every level; see
  * [[Sketches]] for the mergeable-sketch route that restores the two-phase
  * shape approximately.
  */
object MultiLevelAgg {

  /** Merge-able aggregate spec: `phase1` runs over raw rows at the finest
    * grain; `merge` combines phase-1 partials across grouping sets.
    */
  final case class Agg(phase1: Column => Column, merge: Column => Column,
      in: Column, as: String)

  /** count(*) — merged by summing partial counts (long-safe: partials sum
    * to the total row count, which fit a long to begin with). */
  def countAll(as: String): Agg =
    Agg(_ => count(lit(1)), sum, lit(1), as)

  /** sum(c) — decimal/long input keeps its Spark sum type through the
    * merge, so overflow behavior matches the single-phase form. */
  def sumOf(c: Column, as: String): Agg = Agg(sum(_), sum, c, as)

  def minOf(c: Column, as: String): Agg = Agg(min(_), min, c, as)
  def maxOf(c: Column, as: String): Agg = Agg(max(_), max, c, as)

  def rollup(df: DataFrame, keys: Seq[String], aggs: Seq[Agg],
      groupingId: Option[String] = None): DataFrame =
    twoPhase(df, keys, aggs, groupingId, pre => pre.rollup(keys.map(col): _*))

  def cube(df: DataFrame, keys: Seq[String], aggs: Seq[Agg],
      groupingId: Option[String] = None): DataFrame =
    twoPhase(df, keys, aggs, groupingId, pre => pre.cube(keys.map(col): _*))

  /** `sets` are subsets of `keys` (empty set = grand total). */
  def groupingSets(df: DataFrame, keys: Seq[String], sets: Seq[Seq[String]],
      aggs: Seq[Agg], groupingId: Option[String] = None): DataFrame =
    twoPhase(df, keys, aggs, groupingId,
      pre => pre.groupingSets(sets.map(_.map(col)), keys.map(col): _*))

  private def twoPhase(df: DataFrame, keys: Seq[String], aggs: Seq[Agg],
      groupingId: Option[String],
      shape: DataFrame => RelationalGroupedDataset): DataFrame = {
    val tmp = aggs.zipWithIndex.map { case (a, i) => s"__mla_$i" }
    val p1 = aggs.zip(tmp).map { case (a, t) => a.phase1(a.in).as(t) }
    val pre = df.groupBy(keys.map(col): _*).agg(p1.head, p1.tail: _*)
    val p2 = groupingId.map(g => grouping_id().as(g)).toSeq ++
      aggs.zip(tmp).map { case (a, t) => a.merge(col(t)).as(a.as) }
    shape(pre).agg(p2.head, p2.tail: _*)
  }
}
