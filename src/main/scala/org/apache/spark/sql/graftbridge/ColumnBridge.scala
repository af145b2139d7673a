package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 scopes ExpressionUtils private[sql],
  * so this one-liner lives inside the org.apache.spark.sql namespace — the
  * standard extension-point pattern for libraries shipping custom Catalyst
  * expressions without a SparkSessionExtensions registration step.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
