package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's private[sql] Column factory so graft's native
  * Catalyst expressions can be used from the public DataFrame API.
  * (Spark 4 no longer exposes a public Column(Expression) constructor;
  * extension libraries reach it from an `org.apache.spark.sql` subpackage.)
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
