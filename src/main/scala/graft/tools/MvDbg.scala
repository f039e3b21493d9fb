package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object MvDbg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("mvdbg2_").toString
    (1L to 100L).map(i => (i % 7, s"c${i % 3}", BigDecimal(i).setScale(2), i * 2))
      .toDF("k", "c", "amount", "qty").write.parquet(s"$base/grain")
    spark.read.parquet(s"$base/grain").groupBy("k", "c")
      .agg(sum("amount").as("amount_p"), sum("qty").as("qty_p"), count(lit(1)).as("n_rows"))
      .write.parquet(s"$base/mv")
    graft.plans.MvRewrite.register(spark, s"$base/grain", spark.read.parquet(s"$base/mv"),
      Seq("k", "c"), Map("amount" -> "amount_p", "qty" -> "qty_p"), "n_rows")
    spark.experimental.extraOptimizations = Seq(graft.plans.MvRewrite)
    spark.conf.set(graft.plans.MvRewrite.EnabledKey, "true")
    val q = spark.read.parquet(s"$base/grain").groupBy("c")
      .agg(sum("amount").as("rev"), sum("qty").as("tq"), count(lit(1)).as("n"))
      .select(col("c"), col("rev").cast("double").as("rev"), col("tq"), col("n"))
    println(q.queryExecution.optimizedPlan.treeString)
    q.show()
    spark.conf.set(graft.plans.MvRewrite.EnabledKey, "false")
    val d = spark.read.parquet(s"$base/grain").groupBy("c")
      .agg(sum("amount").as("rev"), sum("qty").as("tq"), count(lit(1)).as("n"))
      .select(col("c"), col("rev").cast("double").as("rev"), col("tq"), col("n"))
    d.show()
    spark.stop()
  }
}
