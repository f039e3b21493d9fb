package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: where the sales staging+parse wall time goes. */
object SalesProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def t(label: String)(f: => Unit): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime(); f
        println(f"[probe] $label%-28s run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
    }
    t("lineitem scan")(noop(graft.sources.Sources.table(spark, dir, "lineitem")))
    t("join only") {
      val li = graft.sources.Sources.table(spark, dir, "lineitem")
      val o = graft.sources.Sources.table(spark, dir, "orders")
      noop(li.join(o, col("l_orderkey") === col("o_orderkey")))
    }
    t("stg_sales synth")(noop(graft.etl.Staging.sales(spark, dir)))
    val stg = graft.etl.Staging.sales(spark, dir).cache()
    stg.count()
    t("salesParsed from cached stg")(noop(graft.etl.Transforms.salesParsed(stg)))
    t("parse: ts only")(noop(stg.select(graft.dualTimestamp("saledate").as("ts"))))
    t("parse: numerics only")(noop(stg.select(
      coalesce(graft.numClean("quantity", "INT"), lit(0)).as("q"),
      graft.numClean("unitprice", "DECIMAL(12,2)").as("u"),
      graft.numClean("totalamount", "DECIMAL(18,2)").as("t"))))
    t("parse: trims only")(noop(stg.select(
      trim(col("invoiceid")), trim(col("stockcode")), trim(col("customerid")))))
    spark.stop()
  }
}
