package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryRegistry}
import graft.oracle.OracleSql.q

/** The reference's golden validation suite D1–D10: ETL-vs-ELT pipeline
  * comparison frames (`Iteration 1/Group No.6_ELT.sql:358-470`). Each emits a
  * small labeled DataFrame; the two pipelines must agree on every metric that
  * does not depend on the customer-dedup direction (the one intentional
  * difference: ETL keeps the LATEST signup row, ELT the EARLIEST).
  *
  * U2 union-of-labeled-scalars shape throughout: Spark `union` is UNION ALL —
  * exactly what the reference writes.
  */
object Dsuite extends QueryRegistry {

  private def labeled(name: String, value: org.apache.spark.sql.Column, df: DataFrame, label: String): DataFrame =
    df.agg(value.as(name)).select(lit(label).as("metric"), col(name))

  /** D1: fact row counts. */
  def d1(w: Warehouse): DataFrame =
    labeled("value", count(lit(1)), w.factSales, "fact_sales_etl_count")
      .union(labeled("value", count(lit(1)), w.factSalesElt, "fact_sales_elt_count"))

  /** D2: total revenue. */
  def d2(w: Warehouse): DataFrame =
    labeled("value", coalesce(sum("totalamount"), lit(0)).cast("decimal(18,2)").cast("double"), w.factSales, "fact_sales_etl_sum")
      .union(labeled("value", coalesce(sum("totalamount"), lit(0)).cast("decimal(18,2)").cast("double"), w.factSalesElt, "fact_sales_elt_sum"))

  // portable rounding: round(x*100)/100, never round(x, 2) (engine-divergent at .005)
  private def avgPrice =
    round(sum("unitprice").cast("double") / count(col("unitprice")) * 100) / 100

  /** D3: average unit price. */
  def d3(w: Warehouse): DataFrame =
    labeled("avg_unitprice", avgPrice, w.factSales, "ETL Avg Unit Price")
      .union(labeled("avg_unitprice", avgPrice, w.factSalesElt, "ELT Avg Unit Price"))

  /** D4: unique customers. */
  def d4(w: Warehouse): DataFrame =
    labeled("unique_customers", count_distinct(col("customer_key")), w.factSales, "ETL Unique Customers")
      .union(labeled("unique_customers", count_distinct(col("customer_key")), w.factSalesElt, "ELT Unique Customers"))

  /** D5: unique products. */
  def d5(w: Warehouse): DataFrame =
    labeled("unique_products", count_distinct(col("product_key")), w.factSales, "ETL Unique Products")
      .union(labeled("unique_products", count_distinct(col("product_key")), w.factSalesElt, "ELT Unique Products"))

  /** D6: total quantity. */
  def d6(w: Warehouse): DataFrame =
    labeled("total_quantity", coalesce(sum("quantity"), lit(0)), w.factSales, "ETL Total Quantity")
      .union(labeled("total_quantity", coalesce(sum("quantity"), lit(0)), w.factSalesElt, "ELT Total Quantity"))

  private def top10Countries(fact: DataFrame, dim: DataFrame, label: String): DataFrame =
    fact
      .join(dim.select("customer_key", "country"), Seq("customer_key"))
      .groupBy("country")
      .agg(sum("totalamount").cast("double").as("total_revenue"))
      .orderBy(col("total_revenue").desc, col("country"))
      .limit(10)
      .select(lit(label).as("pipeline"), col("country"), col("total_revenue"))

  /** D7: top-10 country revenue, both pipelines. */
  def d7(w: Warehouse): DataFrame =
    top10Countries(w.factSales, w.dimCustomer, "ETL")
      .union(top10Countries(w.factSalesElt, w.dimCustomerElt, "ELT"))

  /** D8: per-product ETL-vs-ELT revenue diff (J9 aggregated-subquery joins);
    * diffs are 0 by construction, so the reference's ORDER BY ABS(diff) gets a
    * stockcode tie-break to keep top-20 deterministic. */
  def d8(w: Warehouse): DataFrame = {
    val etl = w.factSales.groupBy("product_key").agg(sum("totalamount").as("etl_sum"))
    val elt = w.factSalesElt.groupBy("product_key").agg(sum("totalamount").as("elt_sum"))
    w.dimProduct.select("product_key", "stockcode")
      .join(etl, Seq("product_key"), "left")
      .join(elt, Seq("product_key"), "left")
      .select(
        col("stockcode"),
        coalesce(col("etl_sum"), lit(0)).cast("decimal(18,2)").cast("double").as("etl_total"),
        coalesce(col("elt_sum"), lit(0)).cast("decimal(18,2)").cast("double").as("elt_total"),
        (coalesce(col("elt_sum"), lit(0)) - coalesce(col("etl_sum"), lit(0)))
          .cast("decimal(18,2)").cast("double").as("difference"))
      .orderBy(abs(col("difference")).desc, col("stockcode"))
      .limit(20)
  }

  private def dailyTrend(fact: DataFrame, dimDate: DataFrame, label: String): DataFrame =
    fact
      .join(dimDate.select("date_key", "full_date"), Seq("date_key"))
      .groupBy("full_date")
      .agg(sum("totalamount").cast("double").as("daily_revenue"))
      .select(lit(label).as("pipeline"), col("full_date"), col("daily_revenue"))

  /** D9: daily revenue trend, both pipelines. */
  def d9(w: Warehouse): DataFrame =
    dailyTrend(w.factSales, w.dimDate, "ETL").union(dailyTrend(w.factSalesElt, w.dimDate, "ELT"))

  private def summary(fact: DataFrame, label: String): DataFrame =
    fact.agg(
      count(lit(1)).as("total_rows"),
      sum("totalamount").cast("double").as("total_revenue"),
      avgPrice.as("avg_price"),
      count_distinct(col("customer_key")).as("unique_customers"),
      count_distinct(col("product_key")).as("unique_products"))
      .select(lit(label).as("pipeline"), col("total_rows"), col("total_revenue"),
        col("avg_price"), col("unique_customers"), col("unique_products"))

  /** D10: side-by-side KPI summary. */
  def d10(w: Warehouse): DataFrame =
    summary(w.factSales, "ETL").union(summary(w.factSalesElt, "ELT"))

  private val sqlAvgPrice =
    "round(CAST(sum(unitprice) AS DOUBLE) / count(unitprice) * 100) / 100"

  def defs: Seq[QueryDef] = Seq(
    QueryDef("d01_row_counts", (s, dir) => d1(Warehouse(s, dir)), Some(q("""
      SELECT 'fact_sales_etl_count' AS metric, count(*) AS value FROM fact_sales
      UNION ALL
      SELECT 'fact_sales_elt_count' AS metric, count(*) AS value FROM fact_sales_elt"""))),

    QueryDef("d02_total_revenue", (s, dir) => d2(Warehouse(s, dir)), Some(q("""
      SELECT 'fact_sales_etl_sum' AS metric, CAST(CAST(coalesce(sum(totalamount), 0) AS DECIMAL(18,2)) AS DOUBLE) AS value FROM fact_sales
      UNION ALL
      SELECT 'fact_sales_elt_sum' AS metric, CAST(CAST(coalesce(sum(totalamount), 0) AS DECIMAL(18,2)) AS DOUBLE) AS value FROM fact_sales_elt"""))),

    QueryDef("d03_avg_unitprice", (s, dir) => d3(Warehouse(s, dir)), Some(q(s"""
      SELECT 'ETL Avg Unit Price' AS metric, $sqlAvgPrice AS avg_unitprice FROM fact_sales
      UNION ALL
      SELECT 'ELT Avg Unit Price' AS metric, $sqlAvgPrice AS avg_unitprice FROM fact_sales_elt"""))),

    QueryDef("d04_unique_customers", (s, dir) => d4(Warehouse(s, dir)), Some(q("""
      SELECT 'ETL Unique Customers' AS metric, count(DISTINCT customer_key) AS unique_customers FROM fact_sales
      UNION ALL
      SELECT 'ELT Unique Customers' AS metric, count(DISTINCT customer_key) AS unique_customers FROM fact_sales_elt"""))),

    QueryDef("d05_unique_products", (s, dir) => d5(Warehouse(s, dir)), Some(q("""
      SELECT 'ETL Unique Products' AS metric, count(DISTINCT product_key) AS unique_products FROM fact_sales
      UNION ALL
      SELECT 'ELT Unique Products' AS metric, count(DISTINCT product_key) AS unique_products FROM fact_sales_elt"""))),

    QueryDef("d06_total_quantity", (s, dir) => d6(Warehouse(s, dir)), Some(q("""
      SELECT 'ETL Total Quantity' AS metric, CAST(coalesce(sum(quantity), 0) AS BIGINT) AS total_quantity FROM fact_sales
      UNION ALL
      SELECT 'ELT Total Quantity' AS metric, CAST(coalesce(sum(quantity), 0) AS BIGINT) AS total_quantity FROM fact_sales_elt"""))),

    QueryDef("d07_top10_country_revenue", (s, dir) => d7(Warehouse(s, dir)), Some(q("""
      (SELECT 'ETL' AS pipeline, c.country, CAST(sum(f.totalamount) AS DOUBLE) AS total_revenue
       FROM fact_sales f JOIN dim_customer c ON f.customer_key = c.customer_key
       GROUP BY c.country ORDER BY total_revenue DESC, c.country LIMIT 10)
      UNION ALL
      (SELECT 'ELT' AS pipeline, c.country, CAST(sum(f.totalamount) AS DOUBLE) AS total_revenue
       FROM fact_sales_elt f JOIN dim_customer_elt c ON f.customer_key = c.customer_key
       GROUP BY c.country ORDER BY total_revenue DESC, c.country LIMIT 10)"""))),

    QueryDef("d08_product_level_diff", (s, dir) => d8(Warehouse(s, dir)), Some(q("""
      SELECT p.stockcode,
             CAST(CAST(coalesce(etl.etl_sum, 0) AS DECIMAL(18,2)) AS DOUBLE) AS etl_total,
             CAST(CAST(coalesce(elt.elt_sum, 0) AS DECIMAL(18,2)) AS DOUBLE) AS elt_total,
             CAST(CAST(coalesce(elt.elt_sum, 0) - coalesce(etl.etl_sum, 0) AS DECIMAL(18,2)) AS DOUBLE) AS difference
      FROM dim_product p
      LEFT JOIN (SELECT product_key, sum(totalamount) AS etl_sum FROM fact_sales GROUP BY product_key) etl
             ON etl.product_key = p.product_key
      LEFT JOIN (SELECT product_key, sum(totalamount) AS elt_sum FROM fact_sales_elt GROUP BY product_key) elt
             ON elt.product_key = p.product_key
      ORDER BY abs(coalesce(elt.elt_sum, 0) - coalesce(etl.etl_sum, 0)) DESC, p.stockcode
      LIMIT 20"""))),

    QueryDef("d09_daily_trend", (s, dir) => d9(Warehouse(s, dir)), Some(q("""
      SELECT 'ETL' AS pipeline, d.full_date, CAST(sum(f.totalamount) AS DOUBLE) AS daily_revenue
      FROM fact_sales f JOIN dim_date d ON f.date_key = d.date_key
      GROUP BY d.full_date
      UNION ALL
      SELECT 'ELT' AS pipeline, d.full_date, CAST(sum(f.totalamount) AS DOUBLE) AS daily_revenue
      FROM fact_sales_elt f JOIN dim_date d ON f.date_key = d.date_key
      GROUP BY d.full_date"""))),

    QueryDef("d10_summary_kpis", (s, dir) => d10(Warehouse(s, dir)), Some(q(s"""
      SELECT 'ETL' AS pipeline, count(*) AS total_rows,
             CAST(sum(totalamount) AS DOUBLE) AS total_revenue,
             $sqlAvgPrice AS avg_price,
             count(DISTINCT customer_key) AS unique_customers,
             count(DISTINCT product_key) AS unique_products
      FROM fact_sales
      UNION ALL
      SELECT 'ELT' AS pipeline, count(*) AS total_rows,
             CAST(sum(totalamount) AS DOUBLE) AS total_revenue,
             $sqlAvgPrice AS avg_price,
             count(DISTINCT customer_key) AS unique_customers,
             count(DISTINCT product_key) AS unique_products
      FROM fact_sales_elt"""))))
}
