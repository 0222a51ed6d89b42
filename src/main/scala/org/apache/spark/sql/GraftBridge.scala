package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` Column↔Expression conversion —
  * the standard pattern for libraries shipping custom Catalyst
  * expressions against Spark 4's decoupled Column API (cf. public
  * examples like Qbeast's DatasetFactory). Kept to exactly two
  * forwarding methods. */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
