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

  /** Register a builder in the session's FunctionRegistry so the
    * expression is callable from `spark.sql(...)` text.
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")
}
