package graft.tools

import org.apache.spark.sql.SparkSession

/** r17 probe for the `doc_bpe_merges` drift (VERDICT r16 #2): the row read
  * 1.43→2.05-2.56 s across all three clean r16 runs right after b4cf7f7
  * reworked bpeTrain's per-iteration cache release. Diagnosis (this
  * probe's first iteration, recorded in COVERAGE.md): the old 1.43-1.82
  * recordings measured CROSS-REP CACHE REUSE — pre-b4cf7f7 no per-
  * iteration cache was ever released, and each rep's `syms` chain is
  * plan-identical to the previous rep's still-cached frames, so reps 2+
  * served the merge-fold chain from cache (the same dishonesty class the
  * r16-late emb_mmr_rerank re-record fixed). The honest per-call cost of
  * the cached-chain trainer measured 2.3-2.6 s — and decomposed as
  * O(n²) driver-side analysis of an ever-deeper HOF-fold lineage (the
  * 5→10-merge half costs ~2.7× the 1→5 half). The r17 fix truncates the
  * lineage per generation (localCheckpoint, the connectedComponents
  * discipline), measured 1.24-1.6 s/call honest — faster than even the
  * old reuse-assisted readings.
  *
  * This probe reproduces bench conditions: JIT warm-up at sf0.001, then
  * timed reps at sf0.1. Run: `runMain graft.tools.BpeProbe`. */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(dir: String): Double = {
      val docs = graft.llm.TextOps.docs(spark, dir)
      val t0 = System.nanoTime()
      graft.llm.TextOps.bpeMerges(docs, 10)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    (1 to 3).foreach(_ => run("/root/testdata/sf0.001")) // untimed JIT warm-up
    println("sf0.1 reps: " +
      (1 to 12).map(_ => f"${run("/root/testdata/sf0.1")}%.3f").mkString(" "))
    spark.stop()
  }
}
