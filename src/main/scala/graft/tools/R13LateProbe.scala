package graft.tools

import org.apache.spark.sql.SparkSession

/** r13-late scale probe: wall time of the gate pipelines added after
  * [[R13Probe]]'s measurements at sf0.01 vs sf0.1 (10× rows) — best-of-3
  * after an untimed warm-up, full pipeline including any scenario build the
  * gate performs (that IS the operation's honest cost). Ratios land in
  * COVERAGE.md as the measured scale evidence behind the 100 TB claims.
  * Run: `runMain graft.tools.R13LateProbe`. */
object R13LateProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq(
      "molap_continuous_refresh",   // resumable CDC-span catch-up maintainer
      "molap_mv_rewrite_join",      // star-join served at summary cardinality
      "molap_mv_serve_refreshed",   // DML → CDC refresh → re-register → serve
      "sql_mv_rollup_star",         // verbatim BI SQL served from the summary
      "sql_mv_serving",             // verbatim summary serving SQL
      "sink_versioned_evolve",      // zero-rewrite ADD COLUMNS + backfill + merge
      "sink_versioned_stats_prune", // stats enable + incremental refresh + prune
      "sink_versioned_concurrent",  // two racing writers, conflict + retry
      "multimodal_y4m_features",    // full Y4M container decode
      "sink_versioned_stats_auto",  // optimizer-rule pruning end to end
      "sink_versioned_drop",        // zero-rewrite DROP + post-drop DML
      "sink_versioned_zorder_serve", // cluster commit + refresh + 2-D prune
      "sink_merge_clauses",          // conditional MERGE, all three classes
      "sink_versioned_restore")      // rollback commit + inverse feed
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
        println(f"[r13late] $n%-28s $best%.3f s")
      }
    }
    spark.stop()
  }
}
