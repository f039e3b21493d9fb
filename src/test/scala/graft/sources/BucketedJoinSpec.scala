package graft.sources

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.etl.Warehouse

/** Co-located joins over bucketed layouts must plan without a shuffle. */
class BucketedJoinSpec extends SparkSpec {

  test("join of two tables bucketed on the key runs with zero shuffle exchanges") {
    val w = Warehouse(spark, sfDir)
    Sources.bucketTable(
      w.factSalesElt.select("product_key", "totalamount", "quantity"),
      "fact_bucketed", buckets = 4, key = "product_key", sortBy = Seq("product_key"))
    Sources.bucketTable(
      w.dimProduct.select("product_key", "category"),
      "products_bucketed", buckets = 4, key = "product_key", sortBy = Seq("product_key"))

    val joined = spark.table("fact_bucketed")
      // per-bucket-side hint: disable broadcast so the test exercises the
      // co-located sort-merge path a fact⋈fact join would take at scale
      .join(spark.table("products_bucketed").hint("MERGE"), Seq("product_key"))
      .groupBy("category").agg(sum("totalamount").as("rev"))
    val rows = joined.collect()
    assert(rows.nonEmpty)

    val plan = joined.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val joinShuffles = plan.collect { case e: ShuffleExchangeExec => e }
    // the only exchange allowed is the final groupBy("category") shuffle
    assert(joinShuffles.size <= 1, plan.toString)
    assert(!plan.toString.contains("hashpartitioning(product_key"), plan.toString)

    spark.sql("DROP TABLE IF EXISTS fact_bucketed")
    spark.sql("DROP TABLE IF EXISTS products_bucketed")
  }
}
