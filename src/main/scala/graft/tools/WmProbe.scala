package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical probe of Spark's two-watermark design (r12): append-mode
  * windowed aggregation filters LATE events against the PREVIOUS batch's
  * watermark and evicts/emits against the current one — so a late file
  * arriving in the very batch that first establishes the watermark is NOT
  * dropped (this run emits the "late" hours 1-5, because batch 1's
  * late-event watermark is still 0). The stream_late_data_roundtrip gate
  * stages its drops so the watermark exists one batch before the late
  * file lands. Run: `runMain graft.tools.WmProbe`. */
object WmProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("wmprobe_").toString
    // file a: events at hours 100..110 (on-time). file b: hours 1..5 (late).
    def us(h: Long) = h * 3600L * 1000000L
    (100L to 110L).map(h => (us(h), "x")).toDF("ts", "k")
      .coalesce(1).write.parquet(s"$base/drops/a")
    Thread.sleep(1100)
    (1L to 5L).map(h => (us(h), "x")).toDF("ts", "k")
      .coalesce(1).write.parquet(s"$base/drops/b")
    val src = spark.readStream
      .schema(spark.read.parquet(s"$base/drops/a").schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$base/drops/*")
      .select(col("k"), expr("timestamp_micros(ts)").as("t"))
      .withWatermark("t", "1 hour")
      .groupBy(window(col("t"), "1 hour"), col("k"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour"), col("n"))
    val q = src.writeStream.outputMode("append").format("parquet")
      .option("path", s"$base/out").option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000L)
    val out = spark.read.parquet(s"$base/out").select("hour").as[java.sql.Timestamp]
      .collect().map(_.toString).sorted
    println(s"[wmprobe] emitted ${out.length} windows: ${out.mkString(", ")}")
    spark.stop()
  }
}
