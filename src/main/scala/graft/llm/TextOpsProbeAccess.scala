package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.expr

/** Dev-probe access to [[TextOps]]' private building blocks so
  * `tools/R20Probe` can reconstruct pre-r20 operator shapes for interleaved
  * A/B timing. Not part of the shipped library surface. */
object TextOpsProbeAccess {
  def wordTokens: Column = expr("""regexp_extract_all(text, '[A-Za-z0-9_]+', 0)""")
  def spread(df: DataFrame): DataFrame = TextOps.spread(df)
}
