package graft.perf

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.etl.Warehouse

/** Salted aggregation must agree exactly with the direct aggregation. */
class SkewSpec extends SparkSpec {

  test("salted sum/count equal direct groupBy results on a skewed key") {
    val w = Warehouse(spark, sfDir)
    // country is the workload's skewed key (NULL→UNKNOWN absorbs misses)
    val df = w.factSalesElt.select("customer_key", "totalamount")
      .join(w.dimCustomerElt.select("customer_key", "country"), Seq("customer_key"), "left")
      .select(coalesce(col("country"), lit("UNKNOWN")).as("country"), col("totalamount"))

    val direct = df.groupBy("country")
      .agg(sum("totalamount").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getDecimal(1), r.getLong(2)))).toMap

    val salted = Skew.saltedSum(df, Seq("country"), "totalamount")
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    val counts = Skew.saltedCount(df, Seq("country"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    assert(salted.keySet === direct.keySet)
    direct.foreach { case (k, (s, n)) =>
      assert(salted(k) === s, s"sum mismatch for $k")
      assert(counts(k) === n, s"count mismatch for $k")
    }
  }
}
