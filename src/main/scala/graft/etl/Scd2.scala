package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryRegistry}
import graft.oracle.OracleSql.{q => oq}

/** Type-2 slowly-changing-dimension maintenance (beyond parity — the
  * reference keeps current-state dims only, with keep-latest dedup:
  * `Iteration 1/Group No.6_ETL.sql:96-118`; a production warehouse also
  * needs the VERSIONED history those dims discard).
  *
  * A history table carries the dimension's key + tracked attributes plus
  * `valid_from`/`valid_to` (open versions have `valid_to IS NULL`). Folding
  * a new snapshot in:
  *   - new key                     → open a version at `asOf`
  *   - tracked attribute changed   → close the open version at `asOf`, open
  *                                   a new one carrying the new attributes
  *   - unchanged                   → untouched
  *   - key absent from snapshot    → close the open version (a dimension
  *                                   delete; `closeDeletes = false` keeps it)
  *   - already-closed versions     → pass through untouched, never rejoined
  *
  * Scale shape: ONE equi-join of open versions against the snapshot on the
  * key (both dim-sized; broadcast under AQE when the snapshot is small),
  * two projections unioned — identical join subtrees, so the exchange is
  * planned once and reused. Closed history never enters the join: the
  * operator's cost is the CURRENT dimension's size regardless of how deep
  * the history grows. Attribute comparison is null-safe (`<=>`). */
object Scd2 extends QueryRegistry {

  private def tsLit(ts: String): Column =
    lit(ts).cast("timestamp_ntz")

  private def nullTs: Column = lit(null).cast("timestamp_ntz")

  /** First load: every snapshot row becomes an open version at `asOf`. */
  def initialLoad(snapshot: DataFrame, asOf: String): DataFrame =
    snapshot
      .withColumn("valid_from", tsLit(asOf))
      .withColumn("valid_to", nullTs)

  /** Fold `snapshot` (the dimension's state at `asOf`) into `history`. */
  def merge(history: DataFrame, snapshot: DataFrame, keys: Seq[String],
      attrs: Seq[String], asOf: String, closeDeletes: Boolean = true): DataFrame = {
    val outCols = (keys ++ attrs :+ "valid_from" :+ "valid_to").map(col)

    val closed = history.filter(col("valid_to").isNotNull).select(outCols: _*)
    val current = history.filter(col("valid_to").isNull)

    // prefix-rename both sides so the full-outer join is unambiguous
    val c = current.select(
      keys.map(k => col(k).as(s"k_$k")) ++
        attrs.map(a => col(a).as(s"c_$a")) :+
        col("valid_from").as("c_valid_from"): _*)
    val s = snapshot.select(
      keys.map(k => col(k).as(s"k_$k")) ++
        attrs.map(a => col(a).as(s"s_$a")) :+
        lit(true).as("s_mark"): _*)
    val j = c.join(s, keys.map(k => s"k_$k"), "full_outer")

    val cExists = col("c_valid_from").isNotNull // valid_from is never null
    val sExists = col("s_mark").isNotNull
    val changed = attrs.map(a => !(col(s"c_$a") <=> col(s"s_$a"))).reduce(_ || _)

    // current-side verdicts: kept open, or closed at asOf
    val closeNow = cExists &&
      (sExists && changed || (!sExists && lit(closeDeletes)))
    val fromCurrent = j.filter(cExists).select(
      keys.map(k => col(s"k_$k").as(k)) ++
        attrs.map(a => col(s"c_$a").as(a)) :+
        col("c_valid_from").as("valid_from") :+
        when(closeNow, tsLit(asOf)).as("valid_to"): _*)

    // snapshot-side verdicts: a new open version for new or changed keys
    val openNow = sExists && (!cExists || changed)
    val fromSnapshot = j.filter(openNow).select(
      keys.map(k => col(s"k_$k").as(k)) ++
        attrs.map(a => col(s"s_$a").as(a)) :+
        tsLit(asOf).as("valid_from") :+
        nullTs.as("valid_to"): _*)

    closed.unionByName(fromCurrent).unionByName(fromSnapshot)
  }

  /** Point-in-time read: the dimension as it stood at `asOf`. */
  def asOfSnapshot(history: DataFrame, asOf: String): DataFrame =
    history.filter(col("valid_from") <= tsLit(asOf) &&
      (col("valid_to").isNull || col("valid_to") > tsLit(asOf)))

  /** Oracle scenario: the product dim initial-loaded at 2020-01-01, then a
    * second deterministic snapshot (every 3rd stockcode's price +1.00,
    * every 17th deleted) merged at 2020-02-01 — exercising new, changed,
    * deleted, and unchanged keys from one data-derived source. Keyed on the
    * NATURAL stockcode (numeric at the source): surrogate keys are engine
    * conventions (xxhash64 here vs row_number in the oracle) and never
    * comparable. */
  private def productScd2(spark: SparkSession, dir: String): DataFrame = {
    val w = Warehouse(spark, dir)
    val code = col("stockcode").cast("long")
    val v1 = w.dimProduct.select("stockcode", "unitprice")
    val v2 = v1.filter(code % 17 =!= 0)
      .withColumn("unitprice",
        when(code % 3 === 0,
          (col("unitprice") + lit(BigDecimal("1.00"))).cast("decimal(12,2)"))
          .otherwise(col("unitprice")))
    merge(initialLoad(v1, "2020-01-01 00:00:00"), v2,
      keys = Seq("stockcode"), attrs = Seq("unitprice"),
      asOf = "2020-02-01 00:00:00")
      .withColumn("unitprice", col("unitprice").cast("double"))
  }

  /** The 2020-01-15 point-in-time read of the same history — must equal the
    * v1 dimension exactly (every version open, none of the v2 churn). */
  private def productScd2AsOf(spark: SparkSession, dir: String): DataFrame =
    asOfSnapshot(productScd2(spark, dir), "2020-01-15 00:00:00")
      .select("stockcode", "unitprice")

  def defs: Seq[QueryDef] = Seq(
    // The oracle spells out the merged history row-by-row (the semantic
    // spec, not a replay of the implementation): v1 rows close iff changed
    // (+1.00 is always a change) or deleted; changed v2 rows reopen.
    QueryDef("dim_product_scd2", productScd2, Some(oq("""
      , pv1 AS (SELECT stockcode, CAST(stockcode AS BIGINT) AS code, unitprice
                FROM dim_product)
      SELECT stockcode, CAST(unitprice AS DOUBLE) AS unitprice,
             TIMESTAMP '2020-01-01 00:00:00' AS valid_from,
             CASE WHEN code % 17 = 0 OR code % 3 = 0
                  THEN TIMESTAMP '2020-02-01 00:00:00' END AS valid_to
      FROM pv1
      UNION ALL
      SELECT stockcode, CAST(unitprice + 1.00 AS DOUBLE) AS unitprice,
             TIMESTAMP '2020-02-01 00:00:00' AS valid_from,
             NULL AS valid_to
      FROM pv1 WHERE code % 3 = 0 AND code % 17 <> 0"""))),

    QueryDef("dim_product_scd2_asof", productScd2AsOf, Some(oq("""
      SELECT stockcode, CAST(unitprice AS DOUBLE) AS unitprice
      FROM dim_product""")))
  )
}
