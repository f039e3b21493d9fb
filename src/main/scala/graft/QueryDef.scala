package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered correctness query: a Spark DataFrame builder over a
  * testdata dir, plus (when SQL-expressible) the equivalent DuckDB oracle
  * statement the driver hash-compares against. Column names/order must match
  * the oracle exactly (the compare sorts columns by name before hashing). */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryRegistry {
  def defs: Seq[QueryDef]
}
