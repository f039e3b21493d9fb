package graft.tools

import org.apache.spark.sql.SparkSession

/** r12 scale probe: wall time of the round's new gate pipelines at sf0.01
  * vs sf0.1 (10× rows) — best-of-3 after an untimed warm-up, full pipeline
  * including any scenario build the gate performs (that IS the operation's
  * honest cost). Ratios land in COVERAGE.md as the measured scale evidence
  * behind the 100 TB claims. Run: `runMain graft.tools.R12Probe`. */
object R12Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq(
      "multimodal_png_features", // encode+deflate fixture + full decode
      "emb_ivfpq_index_roundtrip", // IVF+PQ train, index write, DPP serve
      "events_auto_salted_sum", // decision pass + salted two-phase agg
      "molap_mv_rewrite_avg", // grain+MV build + rewritten avg serve
      "dim_customer_scd2_purged", // 4 folds + history purge + read
      "doc_classifier_sweep_approx", // approx boundaries + checked rollup
      "emb_dim_stats_approx") // GK sketches + rank-contract check
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
        println(f"[r12probe] $n%-32s $best%.3f s")
      }
    }
    spark.stop()
  }
}
