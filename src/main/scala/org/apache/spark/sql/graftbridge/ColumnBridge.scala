package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made the Column <-> catalyst Expression bridge `private[sql]`
  * (Column now wraps a ColumnNode for Connect compatibility). Custom native
  * expressions still need the classic bridge, so this shim re-exports it —
  * the established pattern for Catalyst extensions living outside the Spark
  * tree (cf. public extension projects that plant helpers under
  * org.apache.spark.sql.*). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
