package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ catalyst Expression bridge for graft's native expressions.
  *
  * Spark 4 moved `Column` construction from raw expressions behind
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`); a
  * sub-package of `org.apache.spark.sql` is the sanctioned extension-library
  * access path (the same pattern third-party connector/function libraries
  * use) — no Spark internals are modified.
  */
object expressions {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
