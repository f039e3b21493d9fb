package graft.tools

import org.apache.spark.sql.SparkSession

/** r16 scale probe: the manifest-format evidence — wall time of the gate
  * pipelines the r15 VERDICT named as the byte-copy cost class, at sf0.01
  * vs sf0.1 (10× rows), best-of-3 after an untimed warm-up, full pipeline
  * including the scenario build (that IS the operation's honest cost).
  * Pre-r16 these commits byte-copied every unchanged file, so their cost
  * grew with the TABLE (sink_update_move 12.9 s, sink_versioned_evolve
  * 10.4 s, stream_versioned_commit 14.8 s at sf0.1); with manifest-level
  * file sharing the mutation's cost tracks its CHANGE, and the remaining
  * 10× growth is the scenario build's own scans/writes. Ratios land in
  * COVERAGE.md. Run: `runMain graft.tools.R16Probe`. */
object R16Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq(
      "sink_update_move",        // versioned row move: 2 of 3 files carry
      "sink_versioned_evolve",   // ADD COLUMNS: zero data I/O + backfill + merge
      "stream_versioned_commit", // kill/restart stream, exactly-once commits
      "sink_versioned_update_where", // file-selective repair commit
      "sink_versioned_compact",  // keep-as-is files carried by reference
      "sql_insert_into")         // append commits share the whole prior table
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
        println(f"[r16probe] $n%-32s $best%.3f s")
      }
    }
    spark.stop()
  }
}
