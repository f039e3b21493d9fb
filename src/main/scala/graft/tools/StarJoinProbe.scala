package graft.tools

import org.apache.spark.sql.SparkSession

/** r17 probe for the star_join_smj/shj drift (VERDICT r16 #3): the two
  * forced-shuffle rows read +15-30% across all three clean r16 runs (smj
  * 0.915→1.21 s, shj 0.870→1.04 s vs the r15 clean artifact) while
  * default/bhj/nlj stayed flat. The r16 suspects — session-extension
  * rules, listeners — do not exist on the bench session (no listener is
  * registered anywhere in src/main; the extension sibling session is
  * built lazily AFTER the star rows). This probe isolates the rows under
  * bench conditions (warehouse build + cache + untimed warm-up, same
  * session confs) so the same binary can be timed at two commits:
  * `runMain graft.tools.StarJoinProbe`. */
object StarJoinProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val w = graft.etl.Warehouse.build(spark, "/root/testdata/sf0.1")
    w.factSalesElt.write.format("noop").mode("overwrite").save()
    def time(label: String, reps: Int)(f: => org.apache.spark.sql.DataFrame): Unit = {
      def run(): Double = {
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run(); run() // untimed warm-ups
      println(label + ": " + (1 to reps).map(_ => f"${run()}%.3f").mkString(" "))
    }
    time("default", 6)(graft.perf.Perf.starJoinTop50(w))
    time("bhj", 6)(graft.perf.Perf.starJoinTop50(w, Some("BROADCAST")))
    time("shj", 8)(graft.perf.Perf.starJoinTop50(w, Some("SHUFFLE_HASH")))
    time("smj", 8)(graft.perf.Perf.starJoinTop50(w, Some("MERGE")))
    spark.stop()
  }
}
