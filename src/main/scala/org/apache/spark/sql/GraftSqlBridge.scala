package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Expression converters are `private[sql]` in Spark 4 (the
  * Column class wraps ColumnNode); this package-located bridge exposes the
  * two calls a library registering native expressions needs. No Spark
  * internals are reimplemented — it delegates to
  * `org.apache.spark.sql.classic.ExpressionUtils`.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
