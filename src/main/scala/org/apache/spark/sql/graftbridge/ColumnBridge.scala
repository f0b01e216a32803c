package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(expr)` / `col.expr` bridge between
  * the Column API and Catalyst expressions (the column-node refactor for
  * Connect). Custom native expressions still need it, so this exposes the
  * two `private[sql]` conversions from a package that can see them. This is
  * the same access pattern third-party Spark extensions use.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
