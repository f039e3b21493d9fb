package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Generic as-of join — for each left row, the most recent right row at or
  * before (or strictly before) the left row's time, within the same key.
  *
  * Spark has no native as-of operator, and the naive formulation
  * (`left.join(right, key && rTime <= lTime)` + keep-latest) plans a range
  * join over every (left, right) pair per key — quadratic per key and a
  * BroadcastNestedLoopJoin when the equi-conjunct is missing. The
  * scale-correct shape (SURVEY.md §2.3's as-of note; the
  * [[graft.streaming.EventOps.asofLastError]] instance generalized) is a
  * single partitioned window over the tagged UNION of both sides: one
  * shuffle on the key, one ordered scan per partition carrying the running
  * latest right payload forward. Linear in |left| + |right|, no state
  * beyond the window frame.
  *
  * Tie handling: at equal timestamps the right row is visible to the left
  * row iff `strict` is false; among multiple right rows sharing one
  * (key, time) the greatest payload struct wins (deterministic — document
  * or pre-dedup if another choice is needed). Payload columns must be
  * orderable types (no maps).
  */
object AsOf {

  /** Left columns + an `asof` struct column holding the matched right row's
    * payload columns and its `rightTime` (null struct when no prior right
    * row exists). `left`/`right` must not already use the working column
    * names `_t`/`_side`/`_p`/`_l`. */
  def asOfJoin(left: DataFrame, right: DataFrame, key: Seq[String],
      leftTime: String, rightTime: String, strict: Boolean = false): DataFrame = {
    val payloadCols = right.columns.filterNot(c => key.contains(c) || c == rightTime).toSeq
    val pFields = payloadCols :+ rightTime
    val pType = StructType(pFields.map(c => right.schema(right.schema.fieldIndex(c))))
    val lType = StructType(left.schema.fields)
    // strict: the right row at the SAME instant sorts after the left row and
    // falls outside its running frame; non-strict: before it, inside
    val (sideRight, sideLeft) = if (strict) (1, 0) else (0, 1)
    val rTagged = right.select(
      key.map(col) ++ Seq(
        col(rightTime).as("_t"), lit(sideRight).as("_side"),
        struct(pFields.map(col): _*).as("_p"), lit(null).cast(lType).as("_l")): _*)
    val lTagged = left.select(
      key.map(col) ++ Seq(
        col(leftTime).as("_t"), lit(sideLeft).as("_side"),
        lit(null).cast(pType).as("_p"), struct(left.columns.map(col): _*).as("_l")): _*)
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col("_t"), col("_side"), col("_p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rTagged.unionByName(lTagged)
      .withColumn("asof", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_l").isNotNull)
      .select(col("_l.*"), col("asof"))
  }
}
