package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump the FORMATTED physical plans of headline queries to
  * PLANS.md — the `.explain("formatted")` audit trail the engine's scale
  * claims rest on, regenerated per round (`runMain graft.tools.PlanDump`).
  * Not part of the shipped library. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Representative of each claim family: star join (broadcast + partial
    // agg), OLAP monthly rollup, the window-free heap top-k, the as-of
    // window shape, the bloom-pruned semi join, the map-side-combined vocab
    // aggregate, the zero-shuffle temporal version lookup, and the
    // PQ ADC + rerank two-stage search.
    val names = Seq(
      "perf_star_join_top50", "olap_q1_monthly_country", "events_topk_users",
      "events_asof_join_click", "doc_decontaminate_bloom", "doc_vocab_top100",
      "fact_scd2_temporal_join", "emb_pq_adc_rerank",
      // r11: the islands window over digest-join matches, and the
      // exchange-free partition-local PPM decode
      "doc_shared_spans", "multimodal_features",
      // late r11: the basket-array pair fan-out (no fact self-join), the
      // bucketized interval-overlap hash join (no BNLJ), and the
      // pigeonhole heavy-hitter pipeline (broadcast semi-join verify)
      "olap_basket_lift", "events_interval_overlap", "events_heavy_users",
      // r11 final: the classifier's broadcast-vocab scoring join, the
      // hard-negative bucket equi-join + rounded-cosine rank, and the
      // MV-rewritten aggregate (must show the summary relation, not the base)
      "doc_classifier_scores", "emb_hard_negatives", "molap_mv_rewrite_country",
      // r12: avg/min/max served from the MV partials, the DPP-pruned
      // persisted IVF-PQ serve, the two-phase auto-salted aggregate over a
      // planted-hot key, the exchange-free compressed-codec decode, and the
      // verbatim-SQL Q1 (must plan like the DSL row: broadcasts + partial agg)
      "molap_mv_rewrite_avg", "emb_ivfpq_index_roundtrip",
      "events_auto_salted_sum", "multimodal_png_features", "sql_olap_q1",
      // r13: the grouping-set Expand replayed over MV cells (rollup served
      // from the summary), the CDC-only incremental MV refresh, the skew
      // loop guarding the production MOLAP build, the row-move UPDATE's
      // read-back, the exchange-free lossy-codec decode, and the verbatim
      // MOLAP consistency check
      "molap_mv_rewrite_rollup", "molap_incremental_refresh",
      "molap_month_country_guarded", "sink_update_move",
      "multimodal_jpeg_features", "sql_molap_q7",
      // r13-late: the star join served at summary cardinality, the verbatim
      // BI rollup SQL served from the summary, the stats-pruned versioned
      // read (only admitted files in the scan), and the exchange-free video
      // container decode
      "molap_mv_rewrite_join", "sql_mv_rollup_star",
      "sink_versioned_stats_prune", "multimodal_y4m_features",
      // r14: the auto-served MV (commit listener refreshed + re-registered
      // with no manual step — the plan must scan the summary, not the new
      // snapshot) and the stats auto re-registration's pruned v2 read
      "molap_mv_autoserve", "sink_versioned_stats_autoreg",
      // r15: the cross-process variants (plan-time head check heals the
      // serve), the SQL MERGE routed to the versioned verb, and the
      // maintained table's pruned read after the measured cluster rewrite
      "molap_mv_headcheck", "sink_versioned_stats_headcheck",
      "sql_merge_into", "sink_maintain_policy",
      // r16: the Postgres-form UPDATE…FROM lowered onto the MERGE verb,
      // the min-support-pruned basket fan-out (prefilter before the pair
      // shuffle), the exchange-free color-JPEG decode, and the
      // exchange-free MJPEG/AVI compressed-video decode
      "sql_update_from", "olap_basket_lift_pruned",
      "multimodal_jpeg_color_features", "multimodal_mjpeg_video_features",
      // r19: the print-origin 4-component codec — exchange-free like the
      // rest of the decode family (every exchange outputs only doc_id)
      "multimodal_jpeg_cmyk_features")

    // r18: the approx NTILE segmentations — the plan claim is the ABSENCE
    // of any WindowExec (approx_percentile boundaries + map-side buckets).
    // Dumped DIRECTLY, not via the registry: the registered rows are the
    // CHECKED faces, which gate the approx rollup then emit the exact
    // (windowed) frame for the shared oracle — the scale path is these.
    def direct(sfd: String): Seq[(String, org.apache.spark.sql.DataFrame)] = {
      val w = graft.etl.Warehouse(spark, sfd)
      Seq("olap_ltv_quartiles_approx (scale path)" ->
        graft.olap.Olap.ltvQuartilesApprox(w),
        "olap_rfm_segments_approx (scale path)" ->
        graft.olap.Olap.rfmSegmentsApprox(w))
    }

    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of headline queries\n\n")
    sb.append(s"Generated by `runMain graft.tools.PlanDump` over `$sfDir` ")
    sb.append("(AQE on, warehouse cached — the execution-shaped plans the\n")
    sb.append("bench rows run; re-generate after any operator change).\n")
    val dumps = names.map(n =>
      n -> graft.SparkEntry.queries(n)(spark, sfDir)) ++ direct(sfDir)
    dumps.foreach { case (n, df) =>
      // Execute through the SAME QueryExecution the explain below prints —
      // a noop .write builds a NEW one, so the dump showed the pre-execution
      // AQE plan (initial SMJ where the runtime converts to broadcast,
      // VERDICT r10 #5). toRdd.count() finalizes this plan in place.
      df.queryExecution.toRdd.count()
      sb.append(s"\n## $n\n\n```\n")
      // formatted mode = operator tree, then per-node details; the cached
      // warehouse lineage makes the details section enormous, so keep the
      // whole tree plus the first detail lines and truncate the rest
      val full = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).trim
      val lines = full.linesIterator.toSeq
      val kept = if (lines.size <= 160) lines
        else lines.take(160) :+ s"... [${lines.size - 160} detail lines truncated]"
      sb.append(kept.mkString("\n"))
      sb.append("\n```\n")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get("PLANS.md"), sb.toString)
    println(s"[plandump] wrote PLANS.md (${dumps.size} plans)")
    spark.stop()
  }
}
