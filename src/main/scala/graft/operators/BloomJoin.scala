package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.sql.graft.{expressions => ge}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-pruned semi join — the explicit runtime-filter operator.
  *
  * A semi join whose probe side is enormous and whose build side is small
  * (decontamination: 100 TB of corpus shingles against a bounded benchmark
  * set) pays its cost in the SHUFFLE of the probe side: every exploded
  * probe row rides the exchange even though almost none survive the join.
  * The scale-correct shape is the classic sideways information pass: build
  * a Bloom filter over the build side's keys (one small aggregate), ship
  * its bytes to every probe task as a literal, and drop non-matching rows
  * MAP-SIDE — before the exchange — leaving the exact semi join to clear
  * the filter's false positives. False negatives are impossible, so the
  * result is bit-identical to the plain semi join at any `fpp`.
  *
  * Spark's own `InjectRuntimeFilter` plants the same construct, but only
  * under its size/selectivity heuristics and only for equi-joins it can
  * see whole; this operator makes the decision explicit and composable
  * (any keyed pre-filter, e.g. ahead of a groupBy that follows the join).
  * Both sides of the construct are Spark-native codegen'd expressions
  * ([[BloomFilterAggregate]] / [[BloomFilterMightContain]] over
  * [[XxHash64]]) — no UDF, no driver-side set.
  */
object BloomJoin {

  /** Serialized Bloom filter over `key` of `df`, built as a distributed
    * single-row aggregate (partial sketches merge on the executors; only
    * the final `O(numBits/8)` byte array reaches the driver — the same
    * legitimate-collect shape as the IVF centroid matrix). An empty input
    * yields an empty filter (rejects everything), not null. */
  def bloomOf(df: DataFrame, key: String, expectedItems: Long,
              fpp: Double = 0.01): Array[Byte] = {
    require(expectedItems > 0, "expectedItems must be positive")
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(ge.expression(col(key)))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val bytes = df.select(ge.column(agg).as("bloom")).head().getAs[Array[Byte]](0)
    if (bytes != null) bytes
    else { // aggregate over zero rows evaluates to null
      val out = new java.io.ByteArrayOutputStream()
      BloomFilter.create(expectedItems, numBits).writeTo(out)
      out.toByteArray
    }
  }

  /** Membership test against a serialized filter from [[bloomOf]] —
    * codegen'd, deserialized once per task, never per row. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    ge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType), new XxHash64(Seq(ge.expression(key)))))

  /** `left LEFT SEMI JOIN right ON key` with the probe side pre-pruned
    * map-side by a Bloom filter of `right`'s keys. Result is exactly the
    * plain semi join's. `expectedItems` sizes the filter; pass the build
    * side's (approximate) distinct-key count — overestimates only cost
    * bits, underestimates only raise the false-positive rate (never
    * correctness). */
  def semiJoinPruned(left: DataFrame, right: DataFrame, key: String,
                     expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bloom = bloomOf(right, key, expectedItems, fpp)
    left.filter(mightContain(bloom, left(key)))
      .join(right.select(col(key)), Seq(key), "left_semi")
  }
}
