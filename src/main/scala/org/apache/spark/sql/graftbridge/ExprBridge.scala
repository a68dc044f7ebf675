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
}
