package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the private[sql] Column <-> Expression converters — the
  * standard pattern for libraries shipping custom Catalyst expressions
  * (Spark 4 made Column a ColumnNode wrapper; ExpressionUtils is the
  * supported internal conversion and is stable across 4.x).
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
