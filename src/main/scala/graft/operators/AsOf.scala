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

  /** Forward as-of join — the mirror: for each left row, the EARLIEST right
    * row at or after (or strictly after) its time, same key. Same
    * one-shuffle tagged-union shape, with the frame flipped to
    * `[current, +∞)` and a `first(ignoreNulls)`; at equal timestamps the
    * right row is visible iff `strict` is false, and among right rows
    * sharing one (key, time) the SMALLEST payload struct wins (first over
    * ascending order — the mirror of the backward join's greatest). */
  def asOfJoinForward(left: DataFrame, right: DataFrame, key: Seq[String],
      leftTime: String, rightTime: String, strict: Boolean = false): DataFrame = {
    val payloadCols = right.columns.filterNot(c => key.contains(c) || c == rightTime).toSeq
    val pFields = payloadCols :+ rightTime
    val pType = StructType(pFields.map(c => right.schema(right.schema.fieldIndex(c))))
    val lType = StructType(left.schema.fields)
    // non-strict: the equal-instant right row must sit INSIDE the left
    // row's [current, +∞) frame → left sorts first; strict: right first,
    // landing before the frame start
    val (sideRight, sideLeft) = if (strict) (0, 1) else (1, 0)
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
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    rTagged.unionByName(lTagged)
      .withColumn("asof", first(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_l").isNotNull)
      .select(col("_l.*"), col("asof"))
  }

  /** Nearest-event join — for each left row, the right row CLOSEST in time
    * (either direction), optionally within `toleranceUs`; ties (equal
    * distance both ways) resolve to the EARLIER right row. One tagged
    * union, one shuffle: the backward running-last and forward
    * running-first ride the SAME window partitioning/ordering, so both
    * window nodes share a single exchange. Time columns must be numeric
    * (µs-epoch longs in this engine) — nearest needs exact distance
    * arithmetic. A right row at the left row's exact instant reaches the
    * backward leg (distance 0, unbeatable), so tie placement never
    * affects the outcome. Returns left columns + `asof` (the matched
    * payload struct, null when nothing is in tolerance) + `delta_us`. */
  def nearestJoin(left: DataFrame, right: DataFrame, key: Seq[String],
      leftTime: String, rightTime: String,
      toleranceUs: Option[Long] = None): DataFrame = {
    val payloadCols = right.columns.filterNot(c => key.contains(c) || c == rightTime).toSeq
    val pFields = payloadCols :+ rightTime
    val pType = StructType(pFields.map(c => right.schema(right.schema.fieldIndex(c))))
    val lType = StructType(left.schema.fields)
    val rTagged = right.select(
      key.map(col) ++ Seq(
        col(rightTime).as("_t"), lit(0).as("_side"),
        struct(pFields.map(col): _*).as("_p"), lit(null).cast(lType).as("_l")): _*)
    val lTagged = left.select(
      key.map(col) ++ Seq(
        col(leftTime).as("_t"), lit(1).as("_side"),
        lit(null).cast(pType).as("_p"), struct(left.columns.map(col): _*).as("_l")): _*)
    val ord = Window.partitionBy(key.map(col): _*)
      .orderBy(col("_t"), col("_side"), col("_p"))
    val wb = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val dPrev = col("_t") - col(s"_prev.$rightTime")
    val dNext = col(s"_next.$rightTime") - col("_t")
    val prevOk = col("_prev").isNotNull &&
      toleranceUs.map(t => dPrev <= t).getOrElse(lit(true))
    val nextOk = col("_next").isNotNull &&
      toleranceUs.map(t => dNext <= t).getOrElse(lit(true))
    rTagged.unionByName(lTagged)
      .withColumn("_prev", last(col("_p"), ignoreNulls = true).over(wb))
      .withColumn("_next", first(col("_p"), ignoreNulls = true).over(wf))
      .filter(col("_l").isNotNull)
      .withColumn("asof",
        when(prevOk && (!nextOk || dPrev <= dNext), col("_prev"))
          .when(nextOk, col("_next")))
      .withColumn("delta_us",
        when(col("asof").isNotNull,
          abs(col("_t") - col(s"asof.$rightTime"))))
      .select(col("_l.*"), col("asof"), col("delta_us"))
  }
}
