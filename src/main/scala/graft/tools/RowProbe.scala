package graft.tools

import org.apache.spark.sql.SparkSession

/** Generic gate-row timing probe: `runMain graft.tools.RowProbe <sfDir>
  * <query names…>` — best-of-3 after an untimed warm-up, full pipeline to
  * a noop sink, same protocol as the per-round scale probes. */
object RowProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RowProbe <sfDir> <query…>")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args(0)
    // warm the warehouse caches the way Bench does, so query rows measure
    // steady state rather than the first build
    val w = graft.etl.Warehouse.build(spark, sf)
    w.factSalesElt.write.format("noop").mode("overwrite").save()
    w.dimDate.write.format("noop").mode("overwrite").save()
    args.drop(1).foreach { n =>
      def run(): Double = {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sf)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // warm-up
      val best = (1 to 3).map(_ => run()).min
      println(f"[rowprobe] $n%-32s $best%.3f s")
    }
    spark.stop()
  }
}
