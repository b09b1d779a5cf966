// Bridge into Spark's private[sql] Column<->Expression converters — the
// standard technique for third-party Catalyst extensions (the converters
// are public at bytecode level; only the Scala pickle restricts them).
package org.apache.spark.sql.classic

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
