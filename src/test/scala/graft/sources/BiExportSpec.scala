package graft.sources

import graft.SparkSpec

/** BI export writes every semantic-model table and the facts prune by year. */
class BiExportSpec extends SparkSpec {

  test("exports all 9 model tables; year-partitioned facts read back whole") {
    val out = java.nio.file.Files.createTempDirectory("graft_bi").toString
    BiExport.export(spark, sfDir, out)
    val tables = Seq("customers_etl", "customers_elt", "products", "dates",
      "fact_sales_etl", "fact_sales_elt", "molap_month_country",
      "molap_month_product", "molap_customer_month")
    tables.foreach { t =>
      assert(spark.read.parquet(s"$out/$t").count() > 0, t)
    }
    val fact = graft.etl.Warehouse(spark, sfDir).factSales
    assert(spark.read.parquet(s"$out/fact_sales_etl").count() === fact.count())
    // partition pruning: a year-constrained read only lists that year's dirs
    val pruned = spark.read.parquet(s"$out/fact_sales_etl")
      .filter(org.apache.spark.sql.functions.col("year") === 1996)
    assert(pruned.queryExecution.executedPlan.toString.contains("PartitionFilters: [isnotnull(year"))
    // B-tree analog (R3): rows are date_key-sorted within each file, so
    // row-group min/max stats are tight for range skipping
    val files = new java.io.File(s"$out/fact_sales_etl").listFiles()
      .filter(_.getName.startsWith("year=")).flatMap(_.listFiles())
      .filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    files.take(3).foreach { f =>
      val keys = spark.read.parquet(f.getPath)
        .select("date_key").collect().map(_.getLong(0))
      assert(keys.sameElements(keys.sorted), f.getName)
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
  }
}
