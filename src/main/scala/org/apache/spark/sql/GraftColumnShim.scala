package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column ↔ Expression converters that
  * Spark 4's backend-agnostic Column API hides (columnNodeSupport.scala).
  * Standard extension-library shim: lives in the sql package purely to see
  * the classic converters; no Spark internals are modified.
  */
object GraftColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
