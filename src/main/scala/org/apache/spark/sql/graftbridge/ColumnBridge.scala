package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column⇄Expression converters for
  * the engine's custom Catalyst expressions (the sanctioned pattern for
  * libraries extending Catalyst — lives in a subpackage of
  * `org.apache.spark.sql` solely to satisfy the access scope). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
