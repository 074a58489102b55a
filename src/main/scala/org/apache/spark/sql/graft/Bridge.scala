package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the `private[sql]` Column ⇄ Expression converters in
  * Spark 4.x (`org.apache.spark.sql.classic.ExpressionUtils`). Lives under
  * the `org.apache.spark.sql` package namespace purely for access; contains
  * no Spark-internal logic of its own. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
