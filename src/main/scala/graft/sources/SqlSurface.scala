package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.etl.Warehouse

/** SQL view surface (r11) — the reference's users are SQL-first (its whole
  * implementation is PostgreSQL scripts), so the warehouse registers as
  * temp views and any reference query runs via `spark.sql` verbatim,
  * planned by the same Catalyst pipeline as the DataFrame API (views are
  * lazy plans over the memoized warehouse — registering costs nothing and
  * the cached dims/facts are shared with the DSL surface). Names carry a
  * `graft_` prefix to stay clear of caller catalogs. */
object SqlSurface {

  def register(spark: SparkSession, dir: String): Unit = {
    val w = Warehouse(spark, dir)
    Seq(
      "stg_customers" -> w.stgCustomers, "stg_products" -> w.stgProducts,
      "stg_sales" -> w.stgSales,
      "dim_customer" -> w.dimCustomer, "dim_customer_elt" -> w.dimCustomerElt,
      "dim_product" -> w.dimProduct, "dim_date" -> w.dimDate,
      "sales_final" -> w.salesFinal,
      "fact_sales" -> w.factSales, "fact_sales_elt" -> w.factSalesElt)
      .foreach { case (n, df) => df.createOrReplaceTempView(s"graft_$n") }
  }

  /** The reference's monthly-revenue-by-country query as LITERAL SQL over
    * the registered views — the switch-over path a reference user takes
    * first; shares olap_q1's oracle, so the SQL and DSL surfaces are
    * proven to agree cross-engine, not just with each other. */
  def monthlyCountrySql(spark: SparkSession, dir: String): DataFrame = {
    register(spark, dir)
    spark.sql("""
      SELECT d.year, d.month, coalesce(c.country, 'UNKNOWN') AS country,
             CAST(sum(f.totalamount) AS DOUBLE) AS total_revenue,
             sum(f.quantity) AS total_quantity
      FROM graft_fact_sales_elt f
      JOIN graft_dim_date d ON f.date_key = d.date_key
      LEFT JOIN graft_dim_customer_elt c ON f.customer_key = c.customer_key
      GROUP BY d.year, d.month, coalesce(c.country, 'UNKNOWN')""")
  }
}
