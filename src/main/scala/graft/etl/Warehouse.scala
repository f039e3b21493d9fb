package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap

/** A fully-built star-schema warehouse over one testdata directory — the
  * Spark-side product of the reference's ETL+ELT pipelines
  * (`Iteration 1/Group No.6_ETL.sql`, `Group No.6_ELT.sql`; SURVEY.md §3.1-3.2).
  *
  * Dims and facts are cached: at verification scale they are small, and every
  * registered query re-reads them. At 100 TB the same plan writes the fact
  * partitioned by `year` instead (see [[Warehouse.materialize]]) so analytical
  * scans get Hive-style partition pruning (SURVEY.md §4 R6).
  */
final case class Warehouse(
    stgCustomers: DataFrame,
    stgProducts: DataFrame,
    stgSales: DataFrame,
    stgDates: DataFrame,
    customersBase: DataFrame,
    dimCustomer: DataFrame,
    dimCustomerElt: DataFrame,
    productsBase: DataFrame,
    productsDedup: DataFrame,
    medianPrice: Double,
    dimProduct: DataFrame,
    salesParsed: DataFrame,
    salesFinal: DataFrame,
    tsDomain: DataFrame,
    dimDate: DataFrame,
    factSales: DataFrame,
    factSalesElt: DataFrame) {

  /** Max calendar date in the warehouse — the scalar every "last N period"
    * query anchors on (computed once per warehouse, reused across queries). */
  lazy val maxFullDate: java.time.LocalDate =
    java.time.LocalDate.parse(
      dimDate.agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.col("full_date"))).head().get(0).toString)

  /** Smallest invoice id — the deterministic OLTP probe key (the reference's
    * `(SELECT invoiceid ... LIMIT 1)` scalar subquery, made reproducible). */
  lazy val minInvoiceId: String =
    factSalesElt.agg(org.apache.spark.sql.functions.min(
      org.apache.spark.sql.functions.col("invoiceid"))).head().getString(0)
}

object Warehouse {

  private val cache = TrieMap.empty[(SparkSession, String), Warehouse]

  /** Memoized build per (session, dir) — Verify/Bench run many queries over
    * the same warehouse, so build once and reuse the cached dims/facts. Keyed
    * by the session too: a cached instance holds plans bound to the session
    * that built it, which would throw if replayed on a new session. */
  def apply(spark: SparkSession, dir: String): Warehouse =
    cache.getOrElseUpdate((spark, dir), build(spark, dir))

  def build(spark: SparkSession, dir: String): Warehouse = {
    val stgC = Staging.customers(spark, dir)
    val stgP = Staging.products(spark, dir)
    val stgS = Staging.sales(spark, dir)
    val stgD = Staging.dates(spark, dir)

    // customersBase feeds both dedup directions — cache the shared
    // intermediates so the staging joins run once, not per consumer.
    val cb = Transforms.customersBase(stgC).cache()
    val dimC = Transforms.dimCustomer(cb).cache()
    val dimCElt = Transforms.dimCustomerElt(cb).cache()

    val pb = Transforms.productsBase(stgP)
    val pd = Transforms.productsDedup(pb).cache()
    val median = Transforms.medianPrice(pd)
    val dimP = Transforms.dimProduct(pd, median).cache()

    // salesParsed stays UNcached: salesFinal preserves rows 1:1 (the price
    // repair is a left join against a deduped dim), so every multi-use
    // consumer — the date domain included — reads the cached salesFinal
    // instead. Caching the parse layer too would materialize the same 600k
    // rows twice per build for no extra reuse.
    val sp = Transforms.salesParsed(stgS)
    // One AQE-coalescible shuffle before the cache (r18, found by
    // tools/ScaleAxisProbe): the parse layer above runs WIDE (the staging
    // guard), but a cache that inherits that width hurts tiny-SF query
    // latency — 32 near-empty partitions make partial aggregation useless
    // for ~20k-group keys (every partition emits ~1 row per group). No
    // explicit partition count, so AQE sizes the cache to the DATA: a few
    // partitions at sf0.1, thousands at 100 TB.
    // r20 (guide §2.4): HASH shuffle + sortWithinPartitions replaces r18's
    // repartitionByRange — the RangePartitioner's reservoir-sampling pass
    // re-executed the whole parse pipeline once per build just to pick
    // bounds (one extra full pass at any scale). Cache batches are built
    // from partition-SORTED rows, so per-batch min/max stats stay as tight
    // as the range layout's and date-range predicates prune identically
    // (A/B'd in tools/R20Probe: build 3.37→3.17 s min, datekey/composite
    // range rows flat-to-better). NULL sale_ts rows sort first per
    // partition, clustering into few batches, as before.
    val sf = Transforms.salesFinal(sp, dimP)
      .repartition(org.apache.spark.sql.functions.col("sale_ts"),
        org.apache.spark.sql.functions.col("invoiceid"))
      .sortWithinPartitions(org.apache.spark.sql.functions.col("sale_ts"),
        org.apache.spark.sql.functions.col("invoiceid"))
      .cache()

    val ts = Transforms.tsDomain(sf, stgD)
    val dimD = Transforms.dimDate(ts).cache()

    val fact = Transforms.factSales(sf, dimP, dimC).cache()
    val factElt = Transforms.factSalesElt(sf, dimP, dimCElt).cache()

    Warehouse(stgC, stgP, stgS, stgD, cb, dimC, dimCElt, pb, pd, median, dimP,
      sp, sf, ts, dimD, fact, factElt)
  }

  /** Persist the warehouse as parquet tables; the fact is partitioned by
    * `year` derived from the smart date key so 100 TB scans prune on year
    * (reference range-partitioning experiment,
    * `Iteration 3/Group No.6_Indexing_Partitioning.sql:77-119`). */
  def materialize(spark: SparkSession, dir: String, outDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val w = apply(spark, dir)
    graft.sources.Sources.materialize(w.dimCustomer, s"$outDir/dim_customer")
    graft.sources.Sources.materialize(w.dimCustomerElt, s"$outDir/dim_customer_elt")
    graft.sources.Sources.materialize(w.dimProduct, s"$outDir/dim_product")
    graft.sources.Sources.materialize(w.dimDate, s"$outDir/dim_date")
    graft.sources.Sources.materialize(
      w.factSales.withColumn("year", graft.yearOfDateKey(col("date_key"))),
      s"$outDir/fact_sales", partitionBy = Seq("year"), sortWithin = Seq("date_key"))
    graft.sources.Sources.materialize(
      w.factSalesElt.withColumn("year", graft.yearOfDateKey(col("date_key"))),
      s"$outDir/fact_sales_elt", partitionBy = Seq("year"), sortWithin = Seq("date_key"))
  }
}
