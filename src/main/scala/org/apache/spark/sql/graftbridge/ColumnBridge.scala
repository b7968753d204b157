package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 `Column`s wrap `ColumnNode`s, not catalyst `Expression`s; the
  * converter lives behind `private[sql]`. This bridge (in the sql package
  * namespace, the standard pattern for Spark extension libraries) exposes
  * exactly the two conversions our custom expressions need.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
