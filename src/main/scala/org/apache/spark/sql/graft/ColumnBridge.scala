package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ⇄ Expression converters.
  *
  * Spark 4 rebased `Column` on ColumnNode, so a library can no longer
  * construct a `Column` from a Catalyst `Expression` directly — the only
  * public path is the session FunctionRegistry, which can't close over
  * runtime objects (a Broadcast[BloomFilter] has no SQL literal form).
  * The sanctioned community workaround is this one-file package shim, the
  * same shape Spark-native libraries (ML feature libs, spatial engines)
  * ship. Keep it minimal: two forwarding calls, no state.
  */
object ColumnBridge {
  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Extract the Catalyst expression backing a (classic) Column. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
