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
  * then a single pass emitting 0-2 versions per joined row via explode —
  * not a two-projection union, which would plan the join twice (measured:
  * exchange reuse does not materialize across union branches). Closed
  * history never enters the join: the operator's cost is the CURRENT
  * dimension's size regardless of how deep the history grows. Attribute
  * comparison is null-safe (`<=>`). */
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

    // each joined row emits 0-2 versions in ONE pass (a two-projection
    // union would plan the join twice — measured: no exchange reuse
    // materializes across union branches, so the single-join explode is the
    // shape that holds at scale):
    //  - the current version, kept open or closed at asOf
    //  - a new open version for new or changed keys
    val closeNow = sExists && changed || (!sExists && lit(closeDeletes))
    val currentVersion = struct(
      keys.map(k => col(s"k_$k").as(k)) ++
        attrs.map(a => col(s"c_$a").as(a)) :+
        col("c_valid_from").as("valid_from") :+
        when(closeNow, tsLit(asOf)).otherwise(nullTs).as("valid_to"): _*)
    val newVersion = struct(
      keys.map(k => col(s"k_$k").as(k)) ++
        attrs.map(a => col(s"s_$a").as(a)) :+
        tsLit(asOf).as("valid_from") :+
        nullTs.as("valid_to"): _*)
    val openNow = sExists && (!cExists || changed)
    val emitted = j
      .select(explode(filter(array(
        when(cExists, currentVersion),
        when(openNow, newVersion)), x => x.isNotNull)).as("r"))
      .select((keys ++ attrs :+ "valid_from" :+ "valid_to").map(n => col(s"r.$n")): _*)

    closed.unionByName(emitted)
  }

  /** Point-in-time read: the dimension as it stood at `asOf`. */
  def asOfSnapshot(history: DataFrame, asOf: String): DataFrame =
    history.filter(col("valid_from") <= tsLit(asOf) &&
      (col("valid_to").isNull || col("valid_to") > tsLit(asOf)))

  /** Temporal fact→dimension lookup — the reason a warehouse keeps SCD2
    * history: each fact row joins the version valid AT ITS OWN TIME, not
    * today's. A version's intervals are DISJOINT per key by [[merge]]
    * construction, so this is not a general as-of problem: a plain LEFT
    * equi-join on the key with the interval residual
    * (`valid_from <= t AND (valid_to IS NULL OR valid_to > t)`) matches at
    * most one version per fact row. Under AQE the dim-sized history
    * broadcasts and the FACT IS NEVER SHUFFLED OR SORTED AT ALL — strictly
    * cheaper than the as-of window form (measured 0.35 s vs 1.16 s on the
    * 600k-fact row), which remains the right tool only when the right side
    * is itself fact-sized ([[graft.operators.AsOf]]).
    * Returns the fact columns + an `asof` struct of the live version's
    * attributes, `valid_to`, and `valid_from` (null when none was live). */
  def temporalLookup(fact: DataFrame, history: DataFrame, keys: Seq[String],
      timeCol: String): DataFrame = {
    // the AsOf-compatible payload order: attrs, valid_to, then valid_from
    val pFields = history.columns.toSeq
      .filterNot(c => keys.contains(c) || c == "valid_from") :+ "valid_from"
    val h = history.select(
      keys.map(k => col(k).as(s"_k_$k")) ++ pFields.map(c => col(c).as(s"_h_$c")): _*)
    val cond = keys.map(k => col(k) === col(s"_k_$k")).reduce(_ && _) &&
      col("_h_valid_from") <= col(timeCol) &&
      (col("_h_valid_to").isNull || col("_h_valid_to") > col(timeCol))
    fact.join(h, cond, "left")
      .withColumn("asof", when(col("_h_valid_from").isNotNull,
        struct(pFields.map(c => col(s"_h_$c").as(c)): _*)))
      .drop(keys.map(k => s"_k_$k") ++ pFields.map(c => s"_h_$c"): _*)
  }

  /** Continuous dimension maintenance (the streaming face of [[merge]]):
    * a drop directory of snapshot files, each row stamped with its
    * snapshot's effective timestamp in an `as_of` column — the timestamp
    * belongs IN the feed, not to arrival wall-clock, so replays and
    * multi-snapshot batches stay deterministic. Each micro-batch folds its
    * snapshots into the stored history in ascending `as_of` order (a batch
    * may carry several drops; the per-`as_of` driver loop is
    * snapshot-count-sized). The history store uses the same
    * write-to-sibling-then-swap discipline as
    * [[graft.streaming.IncrementalEtl.maintainMonthCountry]]: the stored
    * table is never input and output of one job, and a crash leaves a
    * recoverable state, never a half-written history. */
  def maintainHistory(spark: SparkSession, dropDir: String, keys: Seq[String],
      attrs: Seq[String], historyPath: String,
      maxFilesPerTrigger: Option[Int] = None)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    // schema from a batch read of the already-present drops — the same
    // no-hard-coded-schema discipline as the events reader
    val reader = spark.readStream.schema(spark.read.parquet(dropDir).schema)
    maxFilesPerTrigger.fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(dropDir)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val asOfs = batch.select("as_of").distinct()
          .collect().map(_.getString(0)).sorted
        asOfs.foreach { asOf =>
          val snapshot = batch.filter(col("as_of") === asOf).drop("as_of")
          val dest = new org.apache.hadoop.fs.Path(historyPath)
          val tmp = new org.apache.hadoop.fs.Path(historyPath + ".tmp")
          val fs = dest.getFileSystem(spark.sessionState.newHadoopConf())
          val merged =
            if (!fs.exists(dest)) initialLoad(snapshot, asOf)
            else merge(spark.read.parquet(historyPath), snapshot, keys, attrs, asOf)
          merged.write.mode("overwrite").parquet(tmp.toString)
          if (fs.exists(dest)) fs.delete(dest, true)
          fs.rename(tmp, dest)
          // the swap changed the path's files out of band — invalidate any
          // cached listing before the next snapshot's merge re-reads it
          spark.catalog.refreshByPath(historyPath)
        }
        ()
      }
  }

  /** The deterministic two-snapshot churn both oracle scenarios share:
    * v1 = the product dim (natural stockcode key — surrogate keys are
    * engine conventions, xxhash64 here vs row_number in the oracle, never
    * comparable); v2 = every 3rd stockcode's price +1.00 (exact decimal
    * addition — no rounding-boundary risk), every 17th deleted. */
  private def productSnapshots(w: Warehouse): (DataFrame, DataFrame) = {
    val code = col("stockcode").cast("long")
    val v1 = w.dimProduct.select("stockcode", "unitprice")
    val v2 = v1.filter(code % 17 =!= 0)
      .withColumn("unitprice",
        when(code % 3 === 0,
          (col("unitprice") + lit(BigDecimal("1.00"))).cast("decimal(12,2)"))
          .otherwise(col("unitprice")))
    (v1, v2)
  }

  /** Oracle scenario: the product dim initial-loaded at 2020-01-01, then
    * the churned snapshot merged at 2020-02-01 — exercising new, changed,
    * deleted, and unchanged keys from one data-derived source. */
  private def productScd2(spark: SparkSession, dir: String): DataFrame = {
    val (v1, v2) = productSnapshots(Warehouse(spark, dir))
    merge(initialLoad(v1, "2020-01-01 00:00:00"), v2,
      keys = Seq("stockcode"), attrs = Seq("unitprice"),
      asOf = "2020-02-01 00:00:00")
      .withColumn("unitprice", col("unitprice").cast("double"))
  }

  /** Streaming roundtrip: the SAME two snapshots delivered as `as_of`-
    * stamped drops through [[maintainHistory]] (one-file micro-batches, so
    * the second snapshot exercises the read-merge-swap path against the
    * stored history), read back — must equal the batch merge row-for-row,
    * so it shares `dim_product_scd2`'s oracle. */
  private def streamScd2Roundtrip(spark: SparkSession, dir: String): DataFrame = {
    val (v1, v2) = productSnapshots(Warehouse(spark, dir))
    val base = java.nio.file.Files.createTempDirectory("graft_scd2_stream_").toString
    v1.withColumn("as_of", lit("2020-01-01 00:00:00"))
      .coalesce(1).write.parquet(s"$base/drops/a")
    v2.withColumn("as_of", lit("2020-02-01 00:00:00"))
      .coalesce(1).write.parquet(s"$base/drops/b")
    val query = maintainHistory(spark, s"$base/drops/*",
      keys = Seq("stockcode"), attrs = Seq("unitprice"),
      historyPath = s"$base/history", maxFilesPerTrigger = Some(1))
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    if (!query.awaitTermination(300000L)) {
      query.stop()
      throw new IllegalStateException(
        "stream_scd2_roundtrip did not finish within 300 s; history is partial")
    }
    spark.read.parquet(s"$base/history")
      .withColumn("unitprice", col("unitprice").cast("double"))
  }

  /** The 2020-01-15 point-in-time read of the same history — must equal the
    * v1 dimension exactly (every version open, none of the v2 churn). */
  private def productScd2AsOf(spark: SparkSession, dir: String): DataFrame =
    asOfSnapshot(productScd2(spark, dir), "2020-01-15 00:00:00")
      .select("stockcode", "unitprice")

  /** Oracle scenario for [[temporalLookup]]: the same churn versioned
    * INSIDE the fact's date range (v1 at 1995, v2 at 1998), every fact row
    * decoding its event time from the smart key — facts before 1998 must
    * see v1 prices, later ones v2 (or nothing, for keys v2 deleted);
    * stockcodes outside the dim and pre-1995 times match no version. */
  private def factScd2Temporal(spark: SparkSession, dir: String): DataFrame = {
    val w = Warehouse(spark, dir)
    val (v1, v2) = productSnapshots(w)
    val hist = merge(initialLoad(v1, "1995-01-01 00:00:00"), v2,
      keys = Seq("stockcode"), attrs = Seq("unitprice"), asOf = "1998-01-01 00:00:00")
    val fact = w.factSalesElt.select(
      col("invoiceid"), col("stockcode"), col("linenumber"),
      to_timestamp(col("date_key").cast("string"), "yyyyMMddHHmmss")
        .cast("timestamp_ntz").as("t"))
    temporalLookup(fact, hist, Seq("stockcode"), "t")
      .select(col("invoiceid"), col("stockcode"), col("linenumber"), col("t"),
        col("asof.unitprice").cast("double").as("version_price"),
        col("asof.valid_from").as("version_from"))
  }

  // The oracle spells out the merged history row-by-row (the semantic
  // spec, not a replay of the implementation): v1 rows close iff changed
  // (+1.00 is always a change) or deleted; changed v2 rows reopen.
  private val mergedHistoryOracle = oq("""
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
      FROM pv1 WHERE code % 3 = 0 AND code % 17 <> 0""")

  def defs: Seq[QueryDef] = Seq(
    QueryDef("dim_product_scd2", productScd2, Some(mergedHistoryOracle)),

    QueryDef("dim_product_scd2_asof", productScd2AsOf, Some(oq("""
      SELECT stockcode, CAST(unitprice AS DOUBLE) AS unitprice
      FROM dim_product"""))),

    // stream-maintained history ≡ batch merge: same oracle, by construction
    // of the roundtrip (the equivalence is gate-checked, not assumed)
    QueryDef("stream_scd2_roundtrip", streamScd2Roundtrip, Some(mergedHistoryOracle)),

    // the oracle replays version selection as CASE logic over the fact's
    // decoded time — deleted keys and pre-history times fall to NULL
    QueryDef("fact_scd2_temporal_join", factScd2Temporal, Some(oq("""
      SELECT f.invoiceid, f.stockcode, f.linenumber,
             strptime(CAST(f.date_key AS VARCHAR), '%Y%m%d%H%M%S') AS t,
             CAST(CASE
               WHEN p.stockcode IS NULL THEN NULL
               WHEN strptime(CAST(f.date_key AS VARCHAR), '%Y%m%d%H%M%S') < TIMESTAMP '1995-01-01' THEN NULL
               WHEN strptime(CAST(f.date_key AS VARCHAR), '%Y%m%d%H%M%S') >= TIMESTAMP '1998-01-01'
                    AND CAST(p.stockcode AS BIGINT) % 17 = 0 THEN NULL
               WHEN strptime(CAST(f.date_key AS VARCHAR), '%Y%m%d%H%M%S') >= TIMESTAMP '1998-01-01'
                    AND CAST(p.stockcode AS BIGINT) % 3 = 0 THEN p.unitprice + 1.00
               ELSE p.unitprice END AS DOUBLE) AS version_price,
             CASE
               WHEN p.stockcode IS NULL THEN NULL
               WHEN strptime(CAST(f.date_key AS VARCHAR), '%Y%m%d%H%M%S') < TIMESTAMP '1995-01-01' THEN NULL
               WHEN strptime(CAST(f.date_key AS VARCHAR), '%Y%m%d%H%M%S') >= TIMESTAMP '1998-01-01'
                    AND CAST(p.stockcode AS BIGINT) % 17 = 0 THEN NULL
               WHEN strptime(CAST(f.date_key AS VARCHAR), '%Y%m%d%H%M%S') >= TIMESTAMP '1998-01-01'
                    AND CAST(p.stockcode AS BIGINT) % 3 = 0 THEN TIMESTAMP '1998-01-01'
               ELSE TIMESTAMP '1995-01-01' END AS version_from
      FROM fact_sales_elt f
      LEFT JOIN dim_product p ON f.stockcode = p.stockcode""")))
  )
}
