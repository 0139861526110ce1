package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into `private[sql]` API: convert between the public
  * Column and a Catalyst Expression (Spark 4 removed the public
  * `new Column(expr)` path). Lives in the org.apache.spark.sql package
  * solely for visibility; no Spark internals are modified.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
