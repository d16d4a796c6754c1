package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column↔Expression converters, so graft's
  * custom Catalyst expressions (graft.functions.*) can be exposed as normal
  * `Column`s. Lives under `org.apache.spark.sql` to satisfy the access
  * modifier — the standard pattern for third-party Spark extension libs.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
