package graft.tools

import org.apache.spark.sql.SparkSession

/** r17: steady-state recording run for the progressive-JPEG decode row
  * (encode fixture + full ten-scan decode per rep) at sf0.1, bench-like
  * (sf0.001 JIT warm-up first). Run: `runMain graft.tools.ProgJpegProbe`. */
object ProgJpegProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(dir: String): Double = {
      val t0 = System.nanoTime()
      graft.llm.MultimodalOps.decodeJpegProgressive(
        graft.llm.MultimodalOps.jpegProgressiveFixture(spark, dir)).toDF()
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    (1 to 3).foreach(_ => run("/root/testdata/sf0.001"))
    println("sf0.1 reps: " +
      (1 to 8).map(_ => f"${run("/root/testdata/sf0.1")}%.3f").mkString(" "))
    spark.stop()
  }
}
