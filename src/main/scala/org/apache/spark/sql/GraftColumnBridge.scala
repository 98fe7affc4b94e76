package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's private[sql] Column ↔ Expression converters, so
  * graft's native Catalyst expressions (CosineSim, MinHashSig,
  * SimHash64) can be exposed as plain `Column`s without going through
  * the function registry. Lives in org.apache.spark.sql purely for
  * access; contains no logic.
  */
object GraftColumnBridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
