package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4's `Column` wraps a
  * SQL-agnostic ColumnNode; the classic converters are `private[sql]`,
  * so this one-file shim lives inside the sql package scope — the
  * standard pattern for Spark extension libraries that construct
  * Catalyst expressions directly (no reflection, compile-checked
  * against the Spark version on the classpath).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
