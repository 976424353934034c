package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge from a raw Catalyst `Expression` to a user-facing `Column`.
  * Spark 4 made `Column` wrap a `ColumnNode` and gated the conversion
  * behind `private[sql] ExpressionUtils.column`; this one-liner lives in
  * the `org.apache.spark.sql` namespace to re-export it for graft's custom
  * expressions (standard extension-library pattern — session-independent,
  * unlike FunctionRegistry injection).
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
