package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to the `private[sql]` Column↔Expression converters —
  * needed to expose a custom Catalyst aggregate (graft.functions.LatestBy)
  * as a user-facing `Column` on Spark 4, where `Column` no longer wraps an
  * `Expression` publicly. */
object graftbridge {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
