package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ExprBridge

/** Bounded per-group top-k — the scale-right alternative to the
  * `row_number().over(Window.partitionBy(...))` + `rn <= k` idiom.
  *
  * The window form shuffles and SORTS every group member to keep k of
  * them: at 100 TB a hot group becomes one executor sorting millions of
  * rows it will throw away. This operator aggregates with Spark's
  * bounded-priority-queue `CollectTopK` (via [[ExprBridge.collectTopK]]):
  * O(k) state per group, map-side partial aggregation — each input
  * partition forwards AT MOST k rows per group into the shuffle — and no
  * sort anywhere (the k survivors order themselves on the heap).
  *
  * Ordering contract: `ordKey` is compared by Spark's natural struct
  * ordering (field by field, ascending, NULLs smallest). `largest = true`
  * returns the k largest `ordKey`s ranked 1 = largest (a DESC
  * `row_number`); `largest = false` the k smallest ranked 1 = smallest.
  * Make `ordKey` TOTAL (append the row id) — on full ties the comparison
  * falls through to the payload struct, so payload columns must be
  * orderable types (no maps) and a non-total key would tie-break on
  * payload order instead of something meaningful.
  */
object TopK {

  /** Top-`k` rows per `groupCols` group ranked by `ordKey`.
    * Returns `groupCols ++ (rank: int) ++ payload` with rank 1..k dense
    * per group (groups smaller than k yield all their rows).
    */
  def perGroup(df: DataFrame, groupCols: Seq[String], ordKey: Column,
      payload: Seq[String], k: Int, largest: Boolean = true): DataFrame = {
    require(k >= 1, s"TopK.perGroup: k=$k must be >= 1")
    require(payload.nonEmpty, "TopK.perGroup: payload must be non-empty")
    val child = struct(ordKey.as("__o"),
      struct(payload.map(col): _*).as("__p"))
    // reverse=false keeps the k LARGEST (emitted descending = rank asc);
    // reverse=true the k smallest (emitted ascending) — both verified in
    // TopKSpec against the window form, never assumed
    df.groupBy(groupCols.map(col): _*)
      .agg(ExprBridge.collectTopK(child, k, reverse = !largest).as("__top"))
      .select(groupCols.map(col) :+ posexplode(col("__top")): _*)
      .select(groupCols.map(col) :+
        (col("pos") + 1).cast("int").as("rank") :+ col("col.__p.*"): _*)
  }

  /** Per-group argmax as a bounded ObjectHashAggregate: the exact
    * interpreted ordering of `max(struct(...))` (field by field, NULLs
    * smallest) via `CollectTopK` with k = 1. The `max(struct)` spelling
    * itself cannot ride HashAggregate (no mutable struct buffer) and is
    * not a TypedImperativeAggregate, so Spark plans **SortAggregate** —
    * whose required child ordering per-partition-sorts the ENTIRE
    * aggregate input below the partial agg (q117's argmax sorted the
    * whole cross-join hit relation, q75's the whole doc-quality join —
    * both measured; see OPTIMIZATION_r12.md). This spelling keeps a
    * 1-element bounded heap per group instead and hashes its input.
    * Groups are never empty (groupBy only materializes present keys) and
    * a struct child is never NULL, so the 1-element array is total.
    */
  def argmax(ordKey: Column): Column =
    element_at(ExprBridge.collectTopK(ordKey, 1, reverse = false), 1)

  /** Ascending-total-order key helper for the common "metric DESC, id
    * ASC" ranking under `largest = true`: metric stays as-is, the id
    * tie-break is negated so LARGER (metric, -id) = smaller id on ties.
    * `+ 0.0` canonicalizes -0.0 (IEEE negative zero orders BELOW +0.0 in
    * Spark's double ordering but EQUAL in DuckDB's ORDER BY — the q80
    * convention).
    */
  def descByWithIdTieBreak(metric: Column, id: Column): Column =
    struct((metric + lit(0.0)).as("m"), (-id).as("nid"))
}
