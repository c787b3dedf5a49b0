package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge into `private[sql]` Column↔Expression conversions (Spark 4 classic
 * API). Lives under `org.apache.spark.sql` so custom Catalyst expressions in
 * `graft.functions` can surface as user-facing Columns — the standard
 * pattern for Spark extension libraries.
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
