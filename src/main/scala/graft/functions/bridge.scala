package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ catalyst Expression (and DataFrame ↔ LogicalPlan) bridge for
  * graft's native expressions and its SQL-statement router.
  *
  * Spark 4 moved `Column` construction from raw expressions behind
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`), and
  * `Dataset.ofRows` / `queryExecution` behind the `classic` implementation
  * package; a sub-package of `org.apache.spark.sql` is the sanctioned
  * extension-library access path (the same pattern third-party
  * connector/function libraries use) — no Spark internals are modified.
  */
object expressions {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Analyze and wrap a logical plan as a DataFrame — the inverse of
    * [[plan]], used to run a parsed sub-SELECT after table substitution. */
  def ofRows(spark: SparkSession, p: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], p)

  /** The (analyzed) logical plan behind a DataFrame — what a parsed
    * statement's unresolved relation substitutes to. */
  def plan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
      .queryExecution.analyzed
}
