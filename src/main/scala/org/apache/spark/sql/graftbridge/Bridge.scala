package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal Column <-> Catalyst Expression bridge.
  *
  * Spark 4.x unified the public `Column` API over `ColumnNode` (for Connect
  * compatibility) and made the classic converters `private[sql]`. Libraries
  * that ship native Catalyst expressions (Sedona, Frameless, ...) bridge via
  * an object inside the `org.apache.spark.sql` package namespace; we do the
  * same, confined to this one file.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
