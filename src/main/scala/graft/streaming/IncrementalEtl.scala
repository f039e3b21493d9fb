package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.etl.{Transforms, Warehouse}

/** Incremental ETL: the reference's "Incremental ETL / Automated scheduling"
  * roadmap item (`README.md:180-184`, SURVEY.md §2.10) built Spark-first —
  * the SAME pure transforms that power the batch warehouse build
  * ([[graft.etl.Transforms]]) applied to a Structured Streaming source, so
  * a staged-sales drop directory continuously appends conformed fact rows.
  *
  * Shape: file-source stream of all-string staged sales → parse/clean
  * (narrow, codegen) → three stream-static equi-joins against the already
  * built dims (price repair + surrogate-key resolution). No aggregation, so
  * the query runs in append mode with no watermark state; the static dim
  * sides are broadcast per micro-batch. At scale this is the standing
  * ingestion pipeline: the batch build bootstraps the dims, the stream keeps
  * the fact current between rebuilds.
  */
object IncrementalEtl {

  /** The all-string staged-sales schema (reference staging DDL
    * `Iteration 1/Group No.6_ETL.sql:39-49`); file streams require an
    * explicit schema. */
  val stgSalesSchema: StructType = StructType(
    Seq("invoiceid", "stockcode", "customerid", "saledate",
        "quantity", "unitprice", "totalamount", "linenumber")
      .map(StructField(_, StringType)))

  /** Streaming fact load over a drop directory of staged-sales parquet.
    * Returns an unbounded DataFrame of fact rows (same columns as the batch
    * [[Transforms.factSales]]) ready for `.writeStream` into the fact sink. */
  def streamingFactLoad(spark: SparkSession, dropDir: String, w: Warehouse): DataFrame = {
    val staged = spark.readStream.schema(stgSalesSchema).parquet(dropDir)
    val parsed = Transforms.salesParsed(staged)
    val repaired = Transforms.salesFinal(parsed, w.dimProduct)
    Transforms.factSales(repaired, w.dimProduct, w.dimCustomer)
  }
}
