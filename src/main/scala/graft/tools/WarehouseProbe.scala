package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev probe: per-stage wall cost of the warehouse build (cold vs warm JVM). */
object WarehouseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    (1 to 2).foreach { round =>
      println(s"[probe] ===== build round $round =====")
      val stgC = graft.etl.Staging.customers(spark, dir)
      val stgP = graft.etl.Staging.products(spark, dir)
      val stgS = graft.etl.Staging.sales(spark, dir)
      val stgD = graft.etl.Staging.dates(spark, dir)
      import graft.etl.Transforms
      val cb = t("customersBase")(Transforms.customersBase(stgC).cache())
      t("  materialize cb")(noop(cb))
      val dimC = Transforms.dimCustomer(cb).cache()
      val dimCElt = Transforms.dimCustomerElt(cb).cache()
      t("  dims customer x2")(Seq(dimC, dimCElt).foreach(noop))
      val pd = Transforms.productsDedup(Transforms.productsBase(stgP)).cache()
      t("  productsDedup")(noop(pd))
      val median = t("  medianPrice")(Transforms.medianPrice(pd))
      val dimP = Transforms.dimProduct(pd, median).cache()
      t("  dimProduct")(noop(dimP))
      val sp = Transforms.salesParsed(stgS).cache()
      t("  salesParsed")(noop(sp))
      val sf = Transforms.salesFinal(sp, dimP).cache()
      t("  salesFinal")(noop(sf))
      val dimD = Transforms.dimDate(Transforms.tsDomain(sp, stgD)).cache()
      t("  dimDate")(noop(dimD))
      val fact = Transforms.factSales(sf, dimP, dimC).cache()
      t("  factSales")(noop(fact))
      val factElt = Transforms.factSalesElt(sf, dimP, dimCElt).cache()
      t("  factSalesElt")(noop(factElt))
      Seq(cb, dimC, dimCElt, pd, dimP, sp, sf, dimD, fact, factElt).foreach(_.unpersist(true))
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
