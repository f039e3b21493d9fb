package graft.tools
import org.apache.spark.sql.SparkSession
object PrepProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    val w = graft.etl.Warehouse.build(spark, sf)
    w.factSalesElt.write.format("noop").mode("overwrite").save()
    def best(label: String, reps: Int = 5)(f: => Unit): Unit = {
      f
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"[prep] $label%-28s ${times.min}%.3f s")
    }
    best("dsl_olap_q1") {
      graft.olap.Olap.q1(w).write.format("noop").mode("overwrite").save() }
    graft.sources.SqlSurface.register(spark, sf)
    val sql = graft.sources.SqlSurface.olapSqlTextOf("sql_olap_q1")
    best("sql_olap_q1 (replan/rep)") {
      spark.sql(sql).write.format("noop").mode("overwrite").save() }
    val h = graft.sources.PreparedSql.prepare(spark, sql)
    best("sql_olap_q1_prepared") {
      require(h.executedPlan.execute().count() > 0) }
    spark.stop()
  }
}
