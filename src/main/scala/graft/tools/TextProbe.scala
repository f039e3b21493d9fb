package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev probe: wall time of the per-document text operators at a given SF. */
object TextProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def t(label: String)(f: => DataFrame): Unit = {
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); noop(f); (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $label%-24s cold ${times.head}%8.2f s   warm ${times.last}%8.2f s")
    }
    val docs = graft.llm.TextOps.docs(spark, dir)
    t("simhash (native)")(graft.llm.TextOps.simhash(docs))
    t("simhash (hof)")(graft.llm.TextOps.simhashHof(docs))
    t("fingerprint")(graft.llm.TextOps.fingerprint(docs))
    t("minhash_pairs")(graft.llm.TextOps.minhashPairs(docs))
    t("dedup_clusters")(graft.llm.TextOps.dedupClusters(docs))
    t("ngram_jaccard")(graft.llm.TextOps.ngramJaccard(docs))
    spark.stop()
  }
}
