package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column constructor so the engine's
  * native Catalyst expressions (graft.functions._) are usable from the
  * public DataFrame API — the standard extension-library pattern for
  * Spark 4's decoupled Column API. */
object GraftBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
