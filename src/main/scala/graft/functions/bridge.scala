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

  /** The full query execution behind a DataFrame — what a prepared-
    * statement cache pins (the physical plan survives across executions;
    * re-running it skips parse/analyze/optimize/planning entirely). */
  def queryExecution(df: DataFrame): org.apache.spark.sql.execution.QueryExecution =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]].queryExecution

  /** Execute a pinned PHYSICAL plan and hand the result back as external
    * rows under its analyzed schema — the serving read of a prepared
    * statement (no re-planning; the collect converts internal rows the
    * same way Dataset.collect does). */
  def collectExecuted(spark: SparkSession,
      qe: org.apache.spark.sql.execution.QueryExecution): (Seq[Row], org.apache.spark.sql.types.StructType) = {
    val schema = qe.analyzed.schema
    val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToScalaConverter(schema)
    (qe.executedPlan.executeCollect().toSeq
      .map(ir => conv(ir).asInstanceOf[Row]), schema)
  }
}
