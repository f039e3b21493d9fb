package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: OLTP point-lookup floor decomposition (VERDICT r7 #4).
  * Splits the ~45-55 ms bucketed invoice lookup into (a) plan construction
  * (analyze → optimize → physical planning, paid per query) and (b)
  * execution of an already-planned query (the prepared-statement analog the
  * reference's 15 ms indexed read enjoys — PostgreSQL's planner costs
  * microseconds; Spark's costs tens of ms).
  */
object OltpProbe {
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
    noop(w.factSalesElt)

    val base = java.nio.file.Files.createTempDirectory("graft_oltp").toString
    try {
      graft.sources.Sources.bucketTable(
        w.factSalesElt, "probe_fact_by_invoice", buckets = 32, key = "invoiceid",
        sortBy = Seq("invoiceid"), path = Some(s"$base/fact_by_invoice"))
      val inv = w.minInvoiceId
      def mk(): DataFrame = spark.table("probe_fact_by_invoice")
        .filter(col("invoiceid") === lit(inv))
        .select(col("invoiceid"), col("stockcode"), col("customerid"),
          col("linenumber"), col("quantity"),
          col("totalamount").cast("double").as("totalamount"),
          graft.dateOfDateKey(col("date_key")).as("full_date"))

      def best(label: String, reps: Int = 15)(f: => Unit): Double = {
        f // warm-up
        val runs = (1 to reps).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        println(f"[oltp] $label%-42s best ${runs.min * 1000}%7.1f ms  median ${runs.sorted.apply(reps / 2) * 1000}%7.1f ms")
        runs.min
      }

      // (a) the bench row's shape: fresh DataFrame + noop write per rep
      best("full: plan + execute (noop, as benched)") { noop(mk()) }
      // (b) plan construction only: fresh DataFrame, force the physical plan
      best("plan only: analyze->optimize->physical") { mk().queryExecution.executedPlan }
      // (c) prepared-statement analog: physical plan built once, each rep
      //     re-executes it (new RDD + job per rep — real work, no plan)
      val prepared = mk().queryExecution.executedPlan
      best("prepared: execute pre-built physical plan") {
        val n = prepared.execute().count()
        require(n > 0)
      }
      // (d) same, via collect-style job on the planned query (result fetch)
      val qe = mk()
      qe.queryExecution.executedPlan
      best("prepared DataFrame, repeated noop action") { noop(qe) }
    } finally {
      try spark.sql("DROP TABLE IF EXISTS probe_fact_by_invoice")
      catch { case _: Throwable => () }
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    }
    spark.stop()
  }
}
