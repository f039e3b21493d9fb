package graft.sources

import org.apache.spark.sql.SparkSession

import graft.etl.Warehouse
import graft.olap.Molap

/** S10 BI sink: export the semantic model — the 9 tables Power BI imports in
  * the reference (`Iteration 4/model_view.png`: ETL+ELT facts, the three
  * dims, and the three MOLAP summaries) — one parquet directory per model
  * table. The fact tables partition by year so BI-side incremental refresh
  * and year-sliced reads prune files (SURVEY.md §4 R6). */
object BiExport {

  def export(spark: SparkSession, dir: String, outDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val w = Warehouse(spark, dir)
    val year = graft.yearOfDateKey(col("date_key")).as("year")
    Sources.materialize(w.dimCustomer, s"$outDir/customers_etl")
    Sources.materialize(w.dimCustomerElt, s"$outDir/customers_elt")
    Sources.materialize(w.dimProduct, s"$outDir/products")
    Sources.materialize(w.dimDate, s"$outDir/dates")
    Sources.materialize(w.factSales.withColumn("year", year), s"$outDir/fact_sales_etl", Seq("year"), sortWithin = Seq("date_key"))
    Sources.materialize(w.factSalesElt.withColumn("year", year), s"$outDir/fact_sales_elt", Seq("year"), sortWithin = Seq("date_key"))
    Sources.materialize(Molap.monthCountry(w), s"$outDir/molap_month_country")
    Sources.materialize(Molap.monthProduct(w), s"$outDir/molap_month_product")
    Sources.materialize(Molap.customerMonth(w), s"$outDir/molap_customer_month")
  }
}
