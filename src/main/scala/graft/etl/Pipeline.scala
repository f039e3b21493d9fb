package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Sources

/** End-to-end pipeline runners — the reference's two entry-point families
  * (SURVEY.md §3.1-3.2) as single driver calls:
  *
  *  - [[runEtl]]: extract → check → transform → load (materialized star) →
  *    validate → error-log, mirroring `Iteration 1/Group No.6_ETL.sql`
  *    stage for stage.
  *  - [[runElt]]: raw-copy load (schema clone + append, S4/S5) then
  *    in-warehouse transforms, mirroring `Group No.6_ELT.sql` — the same
  *    transform library, different materialization order.
  *
  * Both return the validation frame the reference prints at the end of each
  * script (row counts + revenue reconciliation + reject count).
  */
object Pipeline {

  private def metric(label: String, df: DataFrame, agg: org.apache.spark.sql.Column): DataFrame =
    df.agg(agg.cast("string").as("value")).select(lit(label).as("metric"), col("value"))

  /** ETL: transform outside, load the finished star (reference §3.1). */
  def runEtl(spark: SparkSession, dir: String, outDir: String): DataFrame = {
    val w = Warehouse(spark, dir)
    Warehouse.materialize(spark, dir, outDir)
    Sources.materialize(Errors.etlErrors(w), s"$outDir/etl_errors")
    validation(spark, w, outDir, "fact_sales")
  }

  /** ELT: land the raw staging feeds first (empty-clone + append), then
    * transform in-warehouse and materialize the ELT star (reference §3.2). */
  def runElt(spark: SparkSession, dir: String, outDir: String): DataFrame = {
    val w = Warehouse(spark, dir)
    // raw-copy load: S4 schema clone (implicit in the parquet write) + S5 append
    Seq("customers" -> w.stgCustomers, "products" -> w.stgProducts,
      "sales" -> w.stgSales, "dates" -> w.stgDates).foreach { case (name, df) =>
      Sources.materialize(Sources.emptyLike(spark, df), s"$outDir/raw_$name")
      Sources.append(df, s"$outDir/raw_$name")
    }
    Warehouse.materialize(spark, dir, outDir)
    validation(spark, w, outDir, "fact_sales_elt")
  }

  private def validation(spark: SparkSession, w: Warehouse, outDir: String, factTable: String): DataFrame = {
    val loadedFact = spark.read.parquet(s"$outDir/$factTable")
    metric("staging_sales_rows", w.salesFinal, count(lit(1)))
      .union(metric("fact_rows", loadedFact, count(lit(1))))
      .union(metric("staging_revenue", w.salesFinal, sum("totalamount")))
      .union(metric("fact_revenue", loadedFact, sum("totalamount")))
      .union(metric("rejected_rows", Errors.rejectedRows(w), count(lit(1))))
  }
}
