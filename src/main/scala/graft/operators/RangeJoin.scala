package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic point-in-interval range join — left rows with a point `t`
  * matched to right rows with an interval `[lo, hi)`.
  *
  * With no equi-conjunct, Catalyst plans a pure range join as a
  * BroadcastNestedLoopJoin — every (left, right) pair compared, quadratic
  * and O(|left|·|right|) at scale. The bucketization trick restores an
  * equi-join: both sides map to fixed-width time buckets (the interval side
  * to EVERY bucket it overlaps via `sequence`), the join runs on the bucket
  * key, and the exact range predicate filters within the bucket-collocated
  * candidates. One shuffle on the bucket key; work scales with
  * |rows| × (interval width / bucket width), not |left| × |right|.
  *
  * `bucketWidth` should be on the order of the typical interval length:
  * wider buckets = fewer duplicate interval copies but more in-bucket
  * candidates to filter.
  */
object RangeJoin {

  /** Inner point-in-interval join; output = left columns + right columns.
    * `t`, `lo`, `hi` are NON-NEGATIVE long-typed columns (epoch ticks at any
    * resolution); intervals are half-open `[lo, hi)`. Distinct matched pairs
    * emerge once even when an interval spans many buckets (the containing
    * bucket of `t` is unique, and the interval copy in that bucket produces
    * the match).
    *
    * Bucket ids use INTEGER division (`div`), not `floor(t / w)`: epoch-ns
    * ticks (~1.7e18) exceed double's 2^53 mantissa, so the double quotient
    * can floor into the wrong bucket within an ulp of a boundary — a silent
    * missed match that test-scale data will essentially never hit but
    * trillions of rows will. (`div` truncates toward zero, which equals
    * floor only for non-negative ticks — hence the precondition.)
    *
    * `_bucket` is a RESERVED working column (as `_t`/`_side`/`_p`/`_l` are
    * for [[AsOf]]) — inputs must not carry it. Degenerate intervals
    * (`hi <= lo`, e.g. malformed data) can never satisfy the range predicate,
    * so they are dropped BEFORE the bucket explosion — otherwise an inverted
    * interval makes `sequence` descend and emits (lo-hi)/bucketWidth spurious
    * bucket copies per row just to discard them at the filter. */
  def pointInInterval(left: DataFrame, right: DataFrame,
      t: String, lo: String, hi: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(!left.columns.contains("_bucket") && !right.columns.contains("_bucket"),
      "_bucket is a reserved working column name")
    val lB = left.withColumn("_bucket", expr(s"`$t` div ${bucketWidth}L"))
    val rB = right.filter(col(hi) > col(lo)).withColumn("_bucket",
      explode(sequence(expr(s"`$lo` div ${bucketWidth}L"),
        // hi is exclusive: an interval ending exactly on a bucket boundary
        // does not reach into that bucket
        expr(s"(`$hi` - 1L) div ${bucketWidth}L"))))
    lB.join(rB, Seq("_bucket"))
      .filter(col(t) >= col(lo) && col(t) < col(hi))
      .drop("_bucket")
  }

  /** Interval × interval OVERLAP join (r11) — the missing member of the
    * temporal-join family beside as-of (backward/forward/nearest) and
    * point-in-interval: emit each (left, right) pair whose half-open
    * intervals `[lLo, lHi)` / `[rLo, rHi)` intersect. Same bucketization as
    * [[pointInInterval]] (both sides explode to every covered bucket, the
    * join runs on the bucket key, the exact overlap predicate filters
    * in-bucket), plus the dedup-free emission rule a two-sided explosion
    * needs: a pair spanning many shared buckets emits ONLY from the bucket
    * containing the overlap START `max(lLo, rLo)` — an instant both
    * intervals cover, so both sides have a copy there, and exactly one
    * bucket satisfies the equality. No DISTINCT pass, no pair ever built
    * twice. Work scales with |rows| × (interval width / bucket width);
    * column names of the two inputs must not collide (same contract as any
    * column-name-addressed join helper here). Non-negative long ticks and
    * the `_bucket` reservation as above; degenerate intervals dropped
    * before explosion on BOTH sides. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      lLo: String, lHi: String, rLo: String, rHi: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(!left.columns.contains("_bucket") && !right.columns.contains("_bucket"),
      "_bucket is a reserved working column name")
    def burst(df: DataFrame, lo: String, hi: String) =
      df.filter(col(hi) > col(lo)).withColumn("_bucket",
        explode(sequence(expr(s"`$lo` div ${bucketWidth}L"),
          expr(s"(`$hi` - 1L) div ${bucketWidth}L"))))
    burst(left, lLo, lHi).join(burst(right, rLo, rHi), Seq("_bucket"))
      .filter(col(lLo) < col(rHi) && col(rLo) < col(lHi))
      .filter(col("_bucket") === expr(s"greatest(`$lLo`, `$rLo`) div ${bucketWidth}L"))
      .drop("_bucket")
  }
}
