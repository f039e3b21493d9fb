package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustered layout — multi-column data skipping.
  *
  * [[Sources.materialize]]'s sort-within-files layout makes ONE column's
  * parquet row-group min/max stats tight; a predicate on any other column
  * still scans everything. Interleaving the bits of each column's RANK
  * BUCKET into a single Morton key and range-partitioning + sorting on it
  * gives every clustered column locally-narrow value ranges in every file,
  * so a multi-dimensional box predicate skips all files whose stats miss
  * the box — the lakehouse `OPTIMIZE ZORDER BY` layout, built from plain
  * Spark primitives (no table format required).
  *
  * Rank buckets (not raw values) drive the interleave: per-column
  * `approxQuantile` cut points map each value to its quantile bucket, so
  * skewed or wildly different-scaled columns still split the key space
  * evenly — the same reason Delta/Iceberg z-order on range ids. The cuts
  * ride into the tasks as array literals; bucketing is a codegen'd HOF
  * fold, the interleave a shift/or tree — no UDF anywhere.
  *
  * Scale shape: one pass computes the quantile sketches (driver holds only
  * `cols × 2^bits` doubles), one pass range-partitions on the Morton key
  * (the shuffle any global clustering needs), each output task writes its
  * sorted slice. Linear, no driver data path.
  */
object ZOrder {

  /** Quantile-rank bucket of `v` given ascending `cuts` (codegen'd fold:
    * bucket = number of cut points at or below the value). */
  def rankBucket(v: Column, cuts: Array[Double]): Column =
    aggregate(lit(cuts), lit(0L),
      (acc, c) => acc + when(v.cast("double") >= c, 1L).otherwise(0L))

  /** Morton key interleaving the low `bits` bits of each bucket column:
    * bit `i` of column `j` lands at position `i * n + j`. */
  def zValue(buckets: Seq[Column], bits: Int): Column = {
    val n = buckets.size
    // n == 1 degenerates to the column's own bucket rank — linear (sort)
    // clustering, the single-column OPTIMIZE every production format also
    // accepts (r15: the maintenance loop clusters on one column)
    require(n >= 1, "z-ordering needs at least one column")
    require(n * bits <= 63, s"$n columns x $bits bits exceeds a long")
    val terms = for {
      i <- 0 until bits
      (b, j) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** The per-column cut points a z-order of `cols` at `bits` resolution
    * uses — exposed so callers can reuse a layout's bucketing. */
  def quantileCuts(df: DataFrame, cols: Seq[String], bits: Int): Seq[Array[Double]] = {
    val nb = 1 << bits
    val probs = (1 until nb).map(_.toDouble / nb).toArray
    // approxQuantile needs a numeric column; cast once into a work frame
    val casted = df.select(cols.map(c => col(c).cast("double").as(c)): _*)
    cols.map(c => casted.stat.approxQuantile(c, probs, 1.0 / (nb * 4)).distinct)
  }

  /** Write `df` to `path` z-ordered on `cols`: range-partitioned into
    * `numFiles` slices of the Morton key, each sorted by it. Column set and
    * row set are unchanged — only the physical clustering differs. */
  def materializeZordered(df: DataFrame, path: String, cols: Seq[String],
                          bits: Int = 8, numFiles: Int = 32): Unit = {
    val cuts = quantileCuts(df, cols, bits)
    val z = zValue(cols.zip(cuts).map { case (c, q) => rankBucket(col(c), q) }, bits)
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }
}
