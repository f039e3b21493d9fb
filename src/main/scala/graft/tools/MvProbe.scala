package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: mv_direct_agg plan variants (VERDICT r7 #6 — 1.30× baseline). */
object MvProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val w = graft.etl.Warehouse.build(spark, dir)
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    noop(w.factSalesElt); noop(w.dimDate)
    def t(label: String)(f: => DataFrame): Unit = {
      noop(f)
      val runs = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); noop(f); (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $label%-28s best ${runs.min}%8.3f s  (${runs.map(x => f"$x%.3f").mkString(", ")})")
    }

    val prodNarrow = w.dimProduct.select("product_key", "category")

    def orig = w.factSalesElt.select("date_key", "product_key", "totalamount")
      .filter(col("date_key") =!= graft.FallbackDateKey)
      .join(prodNarrow, Seq("product_key"))
      .groupBy(graft.monthOfDateKey(col("date_key")).as("month"), col("category"))
      .agg(sum("totalamount").as("rev"))

    def preAgg = w.factSalesElt.select("date_key", "product_key", "totalamount")
      .filter(col("date_key") =!= graft.FallbackDateKey)
      .groupBy(graft.monthOfDateKey(col("date_key")).as("month"), col("product_key"))
      .agg(sum("totalamount").as("rev_part"))
      .join(prodNarrow, Seq("product_key"))
      .groupBy("month", "category")
      .agg(sum("rev_part").as("rev"))

    def noJoinFloor = w.factSalesElt.select("date_key", "totalamount")
      .filter(col("date_key") =!= graft.FallbackDateKey)
      .groupBy(graft.monthOfDateKey(col("date_key")).as("month"))
      .agg(sum("totalamount").as("rev"))

    def origBroadcastHint = w.factSalesElt.select("date_key", "product_key", "totalamount")
      .filter(col("date_key") =!= graft.FallbackDateKey)
      .join(broadcast(prodNarrow), Seq("product_key"))
      .groupBy(graft.monthOfDateKey(col("date_key")).as("month"), col("category"))
      .agg(sum("totalamount").as("rev"))

    def doubleSum = w.factSalesElt.select("date_key", "product_key", "totalamount")
      .filter(col("date_key") =!= graft.FallbackDateKey)
      .join(broadcast(prodNarrow), Seq("product_key"))
      .groupBy(graft.monthOfDateKey(col("date_key")).as("month"), col("category"))
      .agg(sum(col("totalamount").cast("double")).as("rev"))

    def monthFirst = w.factSalesElt.select("date_key", "product_key", "totalamount")
      .filter(col("date_key") =!= graft.FallbackDateKey)
      .select(graft.monthOfDateKey(col("date_key")).as("month"),
        col("product_key"), col("totalamount"))
      .join(broadcast(prodNarrow), Seq("product_key"))
      .groupBy("month", "category")
      .agg(sum("totalamount").as("rev"))

    // exact cents-space sum: totalamount is decimal(18,2); ×100 → long is
    // exact, long sums stay in whole-stage codegen with a primitive buffer,
    // and /100 back to decimal(18,2) restores money typing
    def centsSum = w.factSalesElt.select("date_key", "product_key", "totalamount")
      .filter(col("date_key") =!= graft.FallbackDateKey)
      .join(broadcast(prodNarrow), Seq("product_key"))
      .groupBy(graft.monthOfDateKey(col("date_key")).as("month"), col("category"))
      .agg((sum((col("totalamount") * 100).cast("long")) / 100)
        .cast("decimal(18,2)").as("rev"))

    // reference R9 shape: category-filtered, 3 measures, ORDER BY month DESC
    // LIMIT 12 (Indexing_Partitioning.sql:128-143)
    def refShape = w.factSalesElt
      .select("date_key", "product_key", "customer_key", "unitprice", "totalamount")
      .filter(col("date_key") =!= graft.FallbackDateKey)
      .join(broadcast(prodNarrow.filter(col("category") === "Economy")),
        Seq("product_key"))
      .groupBy(graft.monthOfDateKey(col("date_key")).as("month"), col("category"))
      .agg(sum("totalamount").as("monthly_revenue"),
        avg("unitprice").as("avg_unitprice"),
        count_distinct(col("customer_key")).as("unique_customers"))
      .orderBy(col("month").desc).limit(12)

    t("reference R9 shape")(refShape)
    t("cents-space long sum")(centsSum)
    t("orig (auto join)")(orig)
    t("orig + broadcast hint")(origBroadcastHint)
    t("pre-agg month×product")(preAgg)
    t("floor: no join, month only")(noJoinFloor)
    t("orig, double sum")(doubleSum)
    t("month-decode before join")(monthFirst)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    t("hint, AQE off")(origBroadcastHint)
    t("floor, AQE off")(noJoinFloor)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}
