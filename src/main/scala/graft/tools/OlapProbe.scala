package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: olap q3/q6 plan variants. */
object OlapProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val w = graft.etl.Warehouse(spark, dir)
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    noop(w.factSalesElt); noop(w.dimDate)
    def t(label: String)(f: => DataFrame): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); noop(f); (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $label%-28s best ${runs.min}%8.2f s  (${runs.map(x => f"$x%.2f").mkString(", ")})")
    }
    t("q3 current")(graft.olap.Olap.q3(w))
    t("q3 two-level") {
      val perInvoice = w.factSalesElt
        .select("customer_key", "date_key", "invoiceid", "totalamount")
        .groupBy("customer_key", "invoiceid")
        .agg(sum("totalamount").as("rev"), max("date_key").as("k"))
      val perCustomer = perInvoice.groupBy("customer_key")
        .agg(sum("rev").as("rev"),
          graft.dateOfDateKey(max("k")).as("last_purchase_date"),
          count(col("invoiceid")).as("orders"))
      w.dimCustomerElt.select("customer_key", "customerid", "customername")
        .join(perCustomer, Seq("customer_key"), "left")
        .select(
          col("customerid"), col("customername"),
          coalesce(col("rev"), lit(0)).cast("decimal(18,2)").cast("double").as("lifetime_revenue"),
          col("last_purchase_date"),
          coalesce(col("orders"), lit(0L)).as("order_count"))
    }
    t("q6 current")(graft.olap.Olap.q6(w))
    t("molap_customer_month cur")(graft.olap.Molap.customerMonth(w))
    spark.stop()
  }
}
