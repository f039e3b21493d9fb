package graft.streaming

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.etl.{Staging, Transforms, Warehouse}

/** Streaming fact ingestion must produce exactly the batch fact rows for the
  * same staged input — the incremental path reuses the batch transforms, so
  * the only difference is micro-batch execution + stream-static joins. */
class IncrementalEtlSpec extends SparkSpec {

  test("streaming fact load over two drops equals the batch fact build") {
    val w = Warehouse(spark, sfDir)
    val dropDir = java.nio.file.Files.createTempDirectory("graft_sales_drops").toString

    // two separate drops → two micro-batch inputs
    val staged = Staging.sales(spark, sfDir).limit(2000).cache()
    val Array(dropA, dropB) = staged.randomSplit(Array(0.5, 0.5), seed = 42)
    dropA.write.parquet(s"$dropDir/drop_a")
    dropB.write.parquet(s"$dropDir/drop_b")

    val query = IncrementalEtl.streamingFactLoad(spark, s"$dropDir/*", w)
      .writeStream.format("memory").queryName("fact_stream")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination(120000)

    val streamed = spark.table("fact_stream").collect().map(_.toSeq).toSet
    val batch = Transforms.factSales(
        Transforms.salesFinal(Transforms.salesParsed(staged), w.dimProduct),
        w.dimProduct, w.dimCustomer)
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    staged.unpersist()
  }
}
