package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev probe (r11): steady-state wall seconds for the simhash-pairs drift
  * watch (VERDICT r10 #6) and the r11-new operators, measured best-of-5
  * after an untimed warm-up — the values recorded into Bench.expectedSec. */
object R11Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def t(label: String)(f: => DataFrame): Unit = {
      noop(f) // warm-up
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); noop(f); (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $label%-28s min ${times.min}%7.3f s   med ${times.sorted.apply(2)}%7.3f s")
    }
    val docs = graft.llm.TextOps.docs(spark, dir)
    t("doc_simhash_pairs")(graft.llm.TextOps.simhashPairs(docs))
    t("doc_shared_spans")(graft.llm.TextOps.sharedSpans(docs))
    t("multimodal_ppm_decode")(
      graft.llm.MultimodalOps.decodePpm(graft.llm.MultimodalOps.ppmFixture(spark, dir)).toDF())
    t("dim_customer_scd2_store")(graft.SparkEntry.queries("dim_customer_scd2_store")(spark, dir))
    t("doc_winnow_overlap")(graft.llm.TextOps.winnowOverlap(docs))
    t("doc_bpe_merges")(graft.llm.TextOps.bpeMerges(docs))
    // late-r11 additions
    val w = graft.etl.Warehouse(spark, dir)
    t("olap_basket_lift")(graft.olap.Olap.basketLift(w))
    t("olap_rfm_segments")(graft.olap.Olap.rfmSegments(w))
    val emb = graft.llm.EmbeddingOps.emb(spark, dir)
    t("emb_mmr_rerank")(graft.llm.EmbeddingOps.mmrRerank(emb))
    val events = graft.streaming.EventOps.events(spark, dir)
    t("events_interval_overlap")(graft.streaming.EventOps.incidentActivityOverlap(events))
    t("events_heavy_users")(graft.perf.Skew.heavyKeys(events, "user_id"))
    t("multimodal_wav_decode")(
      graft.llm.MultimodalOps.decodeWav(graft.llm.MultimodalOps.wavFixture(spark, dir)).toDF())
    t("doc_quality_gopher")(graft.llm.TextOps.qualityGopher(docs))
    // final r11 additions
    t("doc_classifier_scores")(graft.llm.TextOps.classifierScores(docs))
    t("doc_split_leakage_safe")(graft.llm.TextOps.leakageSafeSplit(docs))
    t("emb_hard_negatives")(graft.llm.EmbeddingOps.hardNegatives(emb))
    spark.stop()
  }
}
