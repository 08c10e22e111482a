package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column <-> Expression bridge for custom Catalyst expressions. Spark 4
 * made `Column.expr` private behind the Connect-unified Column API; the
 * supported extension pattern (used by public Spark extensions, cf.
 * SNIPPETS.md [2]/[3]) is a shim in the org.apache.spark.sql package.
 */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
