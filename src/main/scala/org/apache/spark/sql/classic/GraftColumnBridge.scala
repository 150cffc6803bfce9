package org.apache.spark.sql.classic

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between user-defined Catalyst `Expression`s and the public
  * `Column` API. Spark 4 routes `Column` through ColumnNodes and keeps
  * the Expression↔Column converters `private[sql]`; this one-file shim
  * (the standard pattern used by Spark-extension libraries) re-exports
  * just the two conversions the graft engine needs.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
