package graft.perf

import java.time.LocalDate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.etl.Warehouse
import graft.{QueryDef, QueryRegistry}
import graft.oracle.OracleSql.q

/** The reference's performance-engineering workload
  * (`Iteration 2/Group No.6_JoinPerformance.sql`,
  * `Iteration 3/Group No.6_Indexing_Partitioning.sql`) as engine operators:
  * the forced-join-strategy matrix (J11 → Spark join hints), the DSS vs OLTP
  * probes, semi-joins, vertical-partition rejoin, share-of-total windows,
  * upsert, and the staging null-check validations.
  *
  * The reference anchors its window to CURRENT_DATE; the data is historical,
  * so the engine anchors to max(full_date) — same intent, deterministic.
  */
object Perf extends QueryRegistry {

  private def maxFullDate(w: Warehouse): LocalDate = w.maxFullDate

  /** J11/R1: the reference's star join, optionally forced to a join strategy
    * via hints (BROADCAST / MERGE / SHUFFLE_HASH / SHUFFLE_REPLICATE_NL) —
    * the Spark analog of `SET enable_hashjoin/mergejoin/nestloop`. */
  def starJoinTop50(w: Warehouse, strategy: Option[String] = None): DataFrame = {
    def h(df: DataFrame): DataFrame = strategy.fold(df)(df.hint(_))
    val minD = java.sql.Date.valueOf(maxFullDate(w).minusMonths(12))
    w.factSalesElt.select("date_key", "product_key", "customer_key", "totalamount")
      .join(h(w.dimDate.select("date_key", "full_date")), Seq("date_key"))
      .filter(col("full_date") >= lit(minD))
      .join(h(w.dimProduct.select("product_key", "stockcode")), Seq("product_key"))
      .join(h(w.dimCustomerElt.select("customer_key")), Seq("customer_key"))
      .groupBy("stockcode")
      .agg(sum("totalamount").cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("stockcode"))
      .limit(50)
  }

  /** Nested-loop matrix row on a bounded fact sample: Spark's only NL
    * strategy is SHUFFLE_REPLICATE_NL (cartesian + filter) — O(|fact|·|dim|)
    * with no index to probe — so the benchmark bounds the fact side. */
  def starJoinTop50NlSample(w: Warehouse, factRows: Int): DataFrame = {
    // CartesianProduct schedules |left|·|right| partition-pair tasks; with
    // 32-partition inputs that is ~1000 tasks per join and scheduling
    // overhead dwarfs the (bounded) compute — coalesce the tiny sides first.
    def h(df: DataFrame): DataFrame = df.coalesce(2).hint("SHUFFLE_REPLICATE_NL")
    val minD = java.sql.Date.valueOf(maxFullDate(w).minusMonths(12))
    w.factSalesElt.select("date_key", "product_key", "customer_key", "totalamount")
      .limit(factRows).coalesce(1)
      .join(h(w.dimDate.select("date_key", "full_date")), Seq("date_key"))
      .filter(col("full_date") >= lit(minD))
      .join(h(w.dimProduct.select("product_key", "stockcode")), Seq("product_key"))
      .join(h(w.dimCustomerElt.select("customer_key")), Seq("customer_key"))
      .groupBy("stockcode")
      .agg(sum("totalamount").cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("stockcode"))
      .limit(50)
  }

  /** DSS analytical aggregate (reference query 4): monthly revenue by country
    * over the trailing 12 months. */
  def dssMonthlyCountry(w: Warehouse): DataFrame = {
    val minD = java.sql.Date.valueOf(maxFullDate(w).minusMonths(12))
    w.factSalesElt.select("date_key", "customer_key", "totalamount")
      .join(w.dimDate.select("date_key", "full_date"), Seq("date_key"))
      .filter(col("full_date") >= lit(minD))
      .join(w.dimCustomerElt.select("customer_key", "country"), Seq("customer_key"), "left")
      .groupBy(trunc(col("full_date"), "month").as("month"),
        coalesce(col("country"), lit("UNKNOWN")).as("country"))
      .agg(sum("totalamount").cast("double").as("revenue"))
  }

  /** OLTP point lookup (P8 + J10 scalar subquery): all fact rows of one
    * deterministic invoice, dims resolved. */
  def oltpInvoiceLookup(w: Warehouse): DataFrame = {
    val inv = w.minInvoiceId
    w.factSalesElt
      .filter(col("invoiceid") === lit(inv))
      .join(w.dimDate.select("date_key", "full_date"), Seq("date_key"), "left")
      .select(col("invoiceid"), col("stockcode"), col("customerid"), col("linenumber"),
        col("quantity"), col("totalamount").cast("double").as("totalamount"), col("full_date"))
  }

  /** DSS-vs-OLTP comparison (reference query 6): full-scan revenue vs a
    * 1000-invoice semi-join (J12/P9). */
  def dssVsOltp(w: Warehouse): DataFrame = {
    val dss = w.factSalesElt.select("date_key", "totalamount")
      .join(w.dimDate.select("date_key"), Seq("date_key"))
      .agg(sum("totalamount").cast("double").as("revenue"))
      .select(lit("DSS").as("query_type"), col("revenue"))
    val ids = w.factSalesElt.select("invoiceid").distinct().orderBy("invoiceid").limit(1000)
    val oltp = w.factSalesElt
      .join(ids, Seq("invoiceid"), "left_semi")
      .agg(sum("totalamount").cast("double").as("revenue"))
      .select(lit("OLTP").as("query_type"), col("revenue"))
    dss.union(oltp)
  }

  /** J13: hot/cold vertical split of dim_product re-joined on the key —
    * with Parquet, column pruning subsumes the split (SURVEY.md §4 R8). */
  def verticalRejoin(w: Warehouse): DataFrame = {
    val hot = w.dimProduct.select("product_key", "stockcode", "unitprice")
    val cold = w.dimProduct.select("product_key", "description", "category", "brand")
    hot.join(cold, Seq("product_key"))
      .select(col("stockcode"), col("unitprice").cast("double").as("unitprice"),
        col("description"), col("category"), col("brand"))
  }

  /** A10/W4: category revenue share-of-total (grand-total window over the
    * already-aggregated frame — the unpartitioned window touches only
    * #categories rows, never the fact). */
  def categoryShare(w: Warehouse): DataFrame = {
    val grouped = w.factSalesElt.select("product_key", "totalamount")
      .join(w.dimProduct.select("product_key", "category"), Seq("product_key"))
      .groupBy("category")
      .agg(sum("totalamount").as("rev"))
    val total = sum(col("rev")).over(Window.partitionBy())
    grouped.select(
      col("category"),
      col("rev").cast("double").as("revenue"),
      (round(col("rev").cast("double") / total.cast("double") * 100 * 100) / 100)
        .as("share_pct"))
  }

  /** S6: upsert (ON CONFLICT DO UPDATE) as full-outer read-modify-write —
    * incoming rows win per column via coalesce. */
  def upsertProducts(w: Warehouse): DataFrame = {
    val existing = w.dimProduct.select("stockcode", "description", "unitprice", "category", "brand")
    val incoming = existing
      .filter(expr("try_cast(stockcode AS INT) % 10 = 0"))
      .withColumn("unitprice", (col("unitprice") * 2).cast("decimal(12,2)"))
    existing.alias("e")
      .join(incoming.alias("i"), col("e.stockcode") === col("i.stockcode"), "full_outer")
      .select(
        coalesce(col("i.stockcode"), col("e.stockcode")).as("stockcode"),
        coalesce(col("i.description"), col("e.description")).as("description"),
        coalesce(col("i.unitprice"), col("e.unitprice")).cast("double").as("unitprice"),
        coalesce(col("i.category"), col("e.category")).as("category"),
        coalesce(col("i.brand"), col("e.brand")).as("brand"))
  }

  /** P3: staging null/blank validation counts. */
  def nullChecks(w: Warehouse): DataFrame = {
    def m(label: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("value")).select(lit(label).as("metric"), col("value"))
    m("stg_customers_blank_id",
      w.stgCustomers.filter(coalesce(trim(col("customerid")), lit("")) === ""))
      .union(m("stg_sales_blank_invoice",
        w.stgSales.filter(coalesce(trim(col("invoiceid")), lit("")) === "")))
      .union(m("stg_sales_unparseable_ts",
        w.salesParsed.filter(col("sale_ts").isNull)))
      .union(m("stg_products_nonnumeric_price",
        w.productsBase.filter(col("unitprice_raw").isNull)))
  }

  /** S9/O4: deterministic preview sink. */
  def previewCustomers(w: Warehouse): DataFrame =
    w.dimCustomer.select("customerid", "customername", "country", "signupdate")
      .orderBy("customerid").limit(5)

  private val w12 = ", w12 AS (SELECT max(full_date) - INTERVAL '12 months' AS min_date FROM dim_date)"

  /** Distinct customer ids active in a calendar year (smart-key range scan —
    * prunable by [[graft.plans.InferYearBoundsFromDateKey]] on a
    * year-partitioned fact). */
  private def customersInYear(w: Warehouse, year: Int): DataFrame =
    w.factSalesElt
      .filter(col("date_key").between(year * 10000000000L + 101000000L, year * 10000000000L + 1231235959L))
      .select("customerid")

  /** §2.7 extension (SURVEY lists INTERSECT/EXCEPT as unused-but-available):
    * customers active in BOTH 1996 and 1997 — INTERSECT distinct semantics. */
  def repeatCustomers(w: Warehouse): DataFrame =
    customersInYear(w, 1996).intersect(customersInYear(w, 1997))

  /** Customers active in 1996 but not 1997 — EXCEPT distinct semantics. */
  def churnedCustomers(w: Warehouse): DataFrame =
    customersInYear(w, 1996).except(customersInYear(w, 1997))

  private def yearCustSql(year: Int): String =
    s"""SELECT customerid FROM fact_sales_elt
        WHERE date_key BETWEEN ${year}0101000000 AND ${year}1231235959"""

  /** The star join's oracle, shared by the default row and the J11 forced-
    * strategy matrix rows: a join HINT may change the physical plan but must
    * never change the result, so all four registered variants hash-compare
    * against this one statement (reference
    * `Iteration 2/Group No.6_JoinPerformance.sql:19-80` — the same query
    * under `enable_hashjoin/mergejoin/nestloop` toggles). */
  private val starJoinOracle: String = q(s"""
      $w12
      SELECT p.stockcode, CAST(sum(f.totalamount) AS DOUBLE) AS revenue
      FROM fact_sales_elt f
      JOIN dim_date d ON f.date_key = d.date_key
      JOIN dim_product p ON f.product_key = p.product_key
      JOIN dim_customer_elt c ON f.customer_key = c.customer_key
      JOIN w12 ON d.full_date >= w12.min_date
      GROUP BY p.stockcode
      ORDER BY revenue DESC, p.stockcode
      LIMIT 50""")

  def defs: Seq[QueryDef] = Seq(
    QueryDef("perf_star_join_bhj",
      (s, dir) => starJoinTop50(Warehouse(s, dir), Some("BROADCAST")), Some(starJoinOracle)),
    QueryDef("perf_star_join_shj",
      (s, dir) => starJoinTop50(Warehouse(s, dir), Some("SHUFFLE_HASH")), Some(starJoinOracle)),
    QueryDef("perf_star_join_smj",
      (s, dir) => starJoinTop50(Warehouse(s, dir), Some("MERGE")), Some(starJoinOracle)),

    QueryDef("perf_repeat_customers", (s, dir) => repeatCustomers(Warehouse(s, dir)), Some(q(s"""
      ${yearCustSql(1996)}
      INTERSECT
      ${yearCustSql(1997)}"""))),

    QueryDef("perf_churned_customers", (s, dir) => churnedCustomers(Warehouse(s, dir)), Some(q(s"""
      ${yearCustSql(1996)}
      EXCEPT
      ${yearCustSql(1997)}"""))),

    QueryDef("perf_star_join_top50",
      (s, dir) => starJoinTop50(Warehouse(s, dir)), Some(starJoinOracle)),

    QueryDef("perf_dss_monthly_country", (s, dir) => dssMonthlyCountry(Warehouse(s, dir)), Some(q(s"""
      $w12
      SELECT CAST(date_trunc('month', d.full_date) AS DATE) AS month,
             coalesce(c.country, 'UNKNOWN') AS country,
             CAST(sum(f.totalamount) AS DOUBLE) AS revenue
      FROM fact_sales_elt f
      JOIN dim_date d ON f.date_key = d.date_key
      LEFT JOIN dim_customer_elt c ON f.customer_key = c.customer_key
      JOIN w12 ON d.full_date >= w12.min_date
      GROUP BY 1, 2"""))),

    QueryDef("perf_oltp_invoice_lookup", (s, dir) => oltpInvoiceLookup(Warehouse(s, dir)), Some(q("""
      SELECT f.invoiceid, f.stockcode, f.customerid, f.linenumber, f.quantity,
             CAST(f.totalamount AS DOUBLE) AS totalamount, d.full_date
      FROM fact_sales_elt f
      LEFT JOIN dim_date d ON f.date_key = d.date_key
      WHERE f.invoiceid = (SELECT min(invoiceid) FROM fact_sales_elt)"""))),

    QueryDef("perf_dss_vs_oltp", (s, dir) => dssVsOltp(Warehouse(s, dir)), Some(q("""
      SELECT 'DSS' AS query_type, CAST(sum(f.totalamount) AS DOUBLE) AS revenue
      FROM fact_sales_elt f JOIN dim_date d ON f.date_key = d.date_key
      UNION ALL
      SELECT 'OLTP' AS query_type, CAST(sum(totalamount) AS DOUBLE) AS revenue
      FROM fact_sales_elt
      WHERE invoiceid IN (SELECT DISTINCT invoiceid FROM fact_sales_elt ORDER BY invoiceid LIMIT 1000)"""))),

    QueryDef("perf_vertical_rejoin", (s, dir) => verticalRejoin(Warehouse(s, dir)), Some(q("""
      SELECT stockcode, CAST(unitprice AS DOUBLE) AS unitprice, description, category, brand FROM dim_product"""))),

    QueryDef("perf_category_share", (s, dir) => categoryShare(Warehouse(s, dir)), Some(q("""
      , by_cat AS (
          SELECT p.category, sum(f.totalamount) AS rev
          FROM fact_sales_elt f JOIN dim_product p ON f.product_key = p.product_key
          GROUP BY p.category)
      SELECT category,
             CAST(rev AS DOUBLE) AS revenue,
             round(CAST(rev AS DOUBLE) / CAST(sum(rev) OVER () AS DOUBLE) * 100 * 100) / 100 AS share_pct
      FROM by_cat"""))),

    QueryDef("perf_upsert_products", (s, dir) => upsertProducts(Warehouse(s, dir)), Some(q("""
      , incoming AS (
          SELECT stockcode, description, CAST(unitprice * 2 AS DECIMAL(12,2)) AS unitprice,
                 category, brand
          FROM dim_product WHERE try_cast(stockcode AS INT) % 10 = 0)
      SELECT coalesce(i.stockcode, e.stockcode) AS stockcode,
             coalesce(i.description, e.description) AS description,
             CAST(coalesce(i.unitprice, e.unitprice) AS DOUBLE) AS unitprice,
             coalesce(i.category, e.category) AS category,
             coalesce(i.brand, e.brand) AS brand
      FROM dim_product e FULL OUTER JOIN incoming i ON e.stockcode = i.stockcode"""))),

    QueryDef("etl_null_checks", (s, dir) => nullChecks(Warehouse(s, dir)), Some(q("""
      SELECT 'stg_customers_blank_id' AS metric, count(*) AS value FROM stg_customers WHERE coalesce(trim(customerid), '') = ''
      UNION ALL
      SELECT 'stg_sales_blank_invoice' AS metric, count(*) AS value FROM stg_sales WHERE coalesce(trim(invoiceid), '') = ''
      UNION ALL
      SELECT 'stg_sales_unparseable_ts' AS metric, count(*) AS value FROM sales_parsed WHERE sale_ts IS NULL
      UNION ALL
      SELECT 'stg_products_nonnumeric_price' AS metric, count(*) AS value FROM products_base WHERE unitprice_raw IS NULL"""))),

    QueryDef("preview_dim_customer", (s, dir) => previewCustomers(Warehouse(s, dir)), Some(q("""
      SELECT customerid, customername, country, signupdate FROM dim_customer
      ORDER BY customerid LIMIT 5"""))),

    // A7 extension: exact multi-quantile summary of the price distribution —
    // Spark's exact `percentile` and DuckDB's quantile_cont interpolate
    // identically in double (the same contract the median fallback relies on).
    // The scale path swaps in approx_percentile (t-digest) per SURVEY §4.
    QueryDef("perf_price_quantiles", (s, dir) => {
      val w = Warehouse(s, dir)
      w.factSalesElt
        .agg(expr("percentile(cast(unitprice as double), array(0.25, 0.5, 0.75, 0.95))").as("q"))
        .select(col("q")(0).as("p25"), col("q")(1).as("p50"),
          col("q")(2).as("p75"), col("q")(3).as("p95"))
    }, Some(q("""
      SELECT quantile_cont(CAST(unitprice AS DOUBLE), 0.25) AS p25,
             quantile_cont(CAST(unitprice AS DOUBLE), 0.50) AS p50,
             quantile_cont(CAST(unitprice AS DOUBLE), 0.75) AS p75,
             quantile_cont(CAST(unitprice AS DOUBLE), 0.95) AS p95
      FROM fact_sales_elt"""))),

    QueryDef("perf_datekey_range_sum", (s, dir) => {
      val w = Warehouse(s, dir)
      w.factSalesElt
        .filter(col("date_key").between(19960101000000L, 19961231235959L))
        .agg(sum("totalamount").cast("double").as("revenue"),
          count(lit(1)).as("n_rows"))
    }, Some(q("""
      SELECT CAST(sum(totalamount) AS DOUBLE) AS revenue, count(*) AS n_rows
      FROM fact_sales_elt
      WHERE date_key BETWEEN 19960101000000 AND 19961231235959"""))))
}
