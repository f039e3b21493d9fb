package graft.tools

import org.apache.spark.sql.SparkSession

/** r13 scale probe: wall time of the round's new gate pipelines at sf0.01
  * vs sf0.1 (10× rows) — best-of-3 after an untimed warm-up, full pipeline
  * including any scenario build the gate performs (that IS the operation's
  * honest cost). Ratios land in COVERAGE.md as the measured scale evidence
  * behind the 100 TB claims. Run: `runMain graft.tools.R13Probe`. */
object R13Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq(
      "molap_incremental_refresh", // versioned base + CDC-only partial merge
      "molap_mv_rewrite_rollup", // grain+MV build + Expand-over-MV rollup
      "molap_mv_rewrite_having", // grain+MV build + HAVING over the rewrite
      "molap_month_country_guarded", // skew decision + both routes + diff
      "sink_update_move", // partition probe + split rewrite + routed insert
      "stream_versioned_commit", // kill/restart stream, exactly-once commits
      "multimodal_jpeg_features", // coefficient encode + full baseline decode
      "sql_molap_q7") // verbatim MOLAP consistency verification
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { sf =>
      println(s"== $sf")
      names.foreach { n =>
        def run(): Double = {
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(n)(spark, sf)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        run() // warm-up
        val best = (1 to 3).map(_ => run()).min
        println(f"[r13probe] $n%-32s $best%.3f s")
      }
    }
    spark.stop()
  }
}
