package graft.perf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot grouping keys: two-phase salted aggregation.
  *
  * A straight `groupBy(key).agg(sum)` sends every row of a hot key to one
  * reducer; at 100 TB a single skewed key (the reference workload's
  * 'UNKNOWN' country, a viral product) serializes the stage. Salting
  * appends a random-but-deterministic shard to the key for a partial
  * aggregate, then combines the shards — two small shuffles instead of one
  * skewed one. (AQE's skew-join handling covers joins; this covers
  * aggregations, which AQE does not re-balance.)
  *
  * Only algebraic aggregates compose this way; [[saltedSum]] and
  * [[saltedCount]] cover the workload's revenue/count rollups.
  */
object Skew {

  private def salt(n: Int): Column = pmod(spark_partition_id(), lit(n))

  /** sum(valueCol) grouped by `keys`, resistant to hot keys. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String, shards: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    df.groupBy(keyCols :+ salt(shards).as("_salt"): _*)
      .agg(sum(valueCol).as("_partial"))
      .groupBy(keyCols: _*)
      .agg(sum("_partial").as(s"sum_$valueCol"))
  }

  /** count(*) grouped by `keys`, resistant to hot keys. */
  def saltedCount(df: DataFrame, keys: Seq[String], shards: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    df.groupBy(keyCols :+ salt(shards).as("_salt"): _*)
      .agg(count(lit(1)).as("_partial"))
      .groupBy(keyCols: _*)
      .agg(sum("_partial").as("n"))
  }
}
