// Spark keeps the Expression ⇄ Column converters private[sql]
// (org.apache.spark.sql.classic.ExpressionUtils), so a library adding a
// custom Catalyst Expression needs this one-file bridge inside the sql
// namespace. No Spark internals are modified — the two methods below only
// re-export the public-static converters for graft.functions.
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
