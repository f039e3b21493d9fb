package graft.tools
import org.apache.spark.sql.SparkSession

/** Records the near-dup pair FAN-OUT at sf0.1 vs the 10× fixture — the
  * denominator for adjudicating the scale axis's super-linear wall rows
  * (r19, VERDICT r18 #2). The 10× fixture replicates documents as exact
  * twins, so candidate mass grows with corpus overlap by design; this
  * probe counts the actual output pairs so COVERAGE.md can compare wall
  * growth against WORK growth instead of against row count. Recorded
  * 2026-08-16 at HEAD: minhash 826 → 307,600 pairs (372×) at 6.2× wall;
  * simhash 2,538 → 478,800 (189×) at 20.4× wall; winnow/spans 233/6 → 0
  * (the hot-segment guard suppresses 10×-duplicated boilerplate — AQE
  * collapses the plan to EmptyRelation). */
object FanoutDbg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same fixture resolution as ScaleAxisProbe — the fan-out figures this
    // prints adjudicate that probe's super-linear rows, so the two must
    // read the SAME 10x feed
    val sf1 = sys.env.getOrElse("GRAFT_SF1_DIR", "/tmp/graft_sf1")
    Seq("/root/testdata/sf0.1", sf1).foreach { dir =>
      val docs = graft.llm.TextOps.docs(spark, dir)
      println(s"$dir minhash_pairs=${graft.llm.TextOps.minhashPairs(docs).count()}" +
        s" simhash_pairs=${graft.llm.TextOps.simhashPairs(docs).count()}" +
        s" winnow=${graft.llm.TextOps.winnowOverlap(docs).count()}" +
        s" spans=${graft.llm.TextOps.sharedSpans(docs).count()}")
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
