package graft.etl

import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryRegistry}
import graft.oracle.OracleSql.q

/** Per-stage identity queries over the warehouse build — each stage of the
  * ETL (staging synthesis → conform → dims → fact) is hash-compared against
  * the DuckDB oracle's equivalent CTE, pinning down engine-parity risks
  * (decimal rounding, timestamp parsing, dedup tie-breaks) before anything is
  * built on top.
  *
  * Surrogate keys are excluded from compared projections (key values are
  * engine-specific; every other column is key-value-independent —
  * FIXTURES.md §4).
  */
object WarehouseQueries extends QueryRegistry {

  def defs: Seq[QueryDef] = Seq(
    QueryDef("stg_customers",
      (s, d) => Staging.customers(s, d),
      Some(q("SELECT * FROM stg_customers"))),

    QueryDef("stg_products",
      (s, d) => Staging.products(s, d),
      Some(q("SELECT * FROM stg_products"))),

    QueryDef("stg_sales",
      (s, d) => Staging.sales(s, d),
      Some(q("SELECT * FROM stg_sales"))),

    QueryDef("stg_date",
      (s, d) => Staging.dates(s, d),
      Some(q("SELECT * FROM stg_date"))),

    QueryDef("customers_base",
      (s, d) => Warehouse(s, d).customersBase,
      Some(q("SELECT * FROM customers_base"))),

    QueryDef("dim_customer",
      (s, d) => Warehouse(s, d).dimCustomer
        .select("customerid", "customername", "country", "signupdate"),
      Some(q("SELECT customerid, customername, country, signupdate FROM dim_customer"))),

    QueryDef("dim_customer_elt",
      (s, d) => Warehouse(s, d).dimCustomerElt
        .select("customerid", "customername", "country", "signupdate"),
      Some(q("SELECT customerid, customername, country, signupdate FROM dim_customer_elt"))),

    QueryDef("dim_product",
      (s, d) => Warehouse(s, d).dimProduct
        .select(col("stockcode"), col("description"),
          col("unitprice").cast("double").as("unitprice"),
          col("category"), col("brand")),
      Some(q("SELECT stockcode, description, CAST(unitprice AS DOUBLE) AS unitprice, category, brand FROM dim_product"))),

    QueryDef("dim_date",
      (s, d) => Warehouse(s, d).dimDate,
      Some(q("""SELECT date_key, full_datetime, full_date, full_time, year, month, day,
                 hour, minute, second, weekday, is_weekend, quarter FROM dim_date"""))),

    QueryDef("sales_final",
      (s, d) => Warehouse(s, d).salesFinal
        .withColumn("unitprice", col("unitprice").cast("double"))
        .withColumn("totalamount", col("totalamount").cast("double")),
      Some(q("""SELECT invoiceid, stockcode, customerid, sale_ts, quantity, linenumber,
                 CAST(unitprice AS DOUBLE) AS unitprice,
                 CAST(totalamount AS DOUBLE) AS totalamount FROM sales_final"""))),

    QueryDef("fact_sales",
      (s, d) => Warehouse(s, d).factSales
        .drop("product_key", "customer_key")
        .withColumn("unitprice", col("unitprice").cast("double"))
        .withColumn("totalamount", col("totalamount").cast("double")),
      Some(q("""SELECT date_key, invoiceid, stockcode, customerid, linenumber, quantity,
                 CAST(unitprice AS DOUBLE) AS unitprice,
                 CAST(totalamount AS DOUBLE) AS totalamount FROM fact_sales"""))),

    QueryDef("fact_sales_elt",
      (s, d) => Warehouse(s, d).factSalesElt
        .drop("product_key", "customer_key")
        .withColumn("unitprice", col("unitprice").cast("double"))
        .withColumn("totalamount", col("totalamount").cast("double")),
      Some(q("""SELECT date_key, invoiceid, stockcode, customerid, linenumber, quantity,
                 CAST(unitprice AS DOUBLE) AS unitprice,
                 CAST(totalamount AS DOUBLE) AS totalamount, load_ts FROM fact_sales_elt"""))))
}
