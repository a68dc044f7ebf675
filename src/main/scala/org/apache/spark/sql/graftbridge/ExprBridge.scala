package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 Column <-> catalyst Expression bridge. Lives under
  * `org.apache.spark.sql` to reach the `private[sql]` classic converters —
  * the supported extension seam for libraries that build custom Catalyst
  * expressions on Spark 4's decoupled Column API.
  */
object ExprBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expr(c: Column): Expression = ExpressionUtils.expression(c)

  /** Bounded per-group top-k: Spark's internal `CollectTopK` aggregate
    * (a `BoundedPriorityQueue` buffer with map-side partial merge — O(k)
    * state per group per partition, the scale-right alternative to a
    * row_number window that shuffles and sorts EVERY group member). The
    * class is `private[sql]`, hence exposed through this bridge package.
    *
    * `reverse = false` keeps the k LARGEST elements of `child`'s natural
    * (ascending, nulls-smallest) interpreted ordering; `reverse = true`
    * keeps the k SMALLEST. Output array order is verified empirically in
    * `TopKSpec` — callers re-sort positionally, never relying on it.
    */
  def collectTopK(child: Column, k: Int, reverse: Boolean): Column =
    ExpressionUtils.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate
        .CollectTopK(ExpressionUtils.expression(child), k, reverse, 0, 0)
        .toAggregateExpression())
}
