package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** r17 probe behind the mmrRerank lineage-truncation rewrite: production
  * (localCheckpoint per greedy round) vs the PRE-r17 shape it replaced —
  * cached per-round state chained through full lineage, with the
  * end-of-call driver collect that existed only to find a safe unpersist
  * point. Recorded at the rewrite: legacy 1.4-1.7 s vs checkpointed
  * 0.77-0.88 s at sf0.1, exceptAll-identical output. Run:
  * `runMain graft.tools.MmrProbe [sfDir]`. */
object MmrProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val emb = graft.llm.EmbeddingOps.emb(spark, sfDir)

    def timeIt(label: String)(f: => DataFrame): Unit = {
      def run(): Double = {
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run()
      println(label + ": " + (1 to 5).map(_ => f"${run()}%.3f").mkString(" "))
    }

    // the PRE-r17 production shape, kept verbatim as the comparison point
    def mmrLegacyCached(k: Int = 5, nCand: Int = 20): DataFrame = {
      val cosine = graft.llm.EmbeddingOps.cosine _
      val e = emb.select("vec_id", "embedding")
      val qs = e.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      def r6(c: Column): Column = round(c, 6).cast("decimal(10,6)").cast("double")
      val wnd = Window.partitionBy("query_id").orderBy(col("raw").desc, col("cand_id"))
      var state = broadcast(qs).crossJoin(e)
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("cand_id"), col("embedding"),
          cosine(col("qe"), col("embedding")).as("raw"))
        .withColumn("rn", row_number().over(wnd)).filter(col("rn") <= nCand)
        .select(col("query_id"), col("cand_id"), col("embedding"),
          r6(col("raw")).as("rel"), lit(-1.0).as("max_sim"))
      var picks: DataFrame = null
      val cached = scala.collection.mutable.Buffer.empty[DataFrame]
      for (r <- 1 to k) {
        val sw = Window.partitionBy("query_id")
          .orderBy((lit(0.7) * col("rel") - lit(0.3) * col("max_sim")).desc, col("cand_id"))
        val sel = state.withColumn("srn", row_number().over(sw))
          .filter(col("srn") === 1)
          .select(col("query_id"), col("cand_id"), col("embedding"), col("rel"))
          .cache()
        cached += sel
        val out = sel.select(col("query_id"), lit(r).as("mmr_rank"),
          col("cand_id").as("neighbor_id"), col("rel").as("relevance"))
        picks = if (picks == null) out else picks.unionByName(out)
        if (r < k)
          state = state
            .join(sel.select(col("query_id"), col("cand_id").as("sel_id"),
              col("embedding").as("sel_emb")), Seq("query_id"))
            .filter(col("cand_id") =!= col("sel_id"))
            .select(col("query_id"), col("cand_id"), col("embedding"), col("rel"),
              greatest(col("max_sim"),
                r6(cosine(col("embedding"), col("sel_emb")))).as("max_sim"))
      }
      val rows = java.util.Arrays.asList(picks.collect(): _*)
      val result = emb.sparkSession.createDataFrame(rows, picks.schema)
      cached.foreach(_.unpersist())
      result
    }

    timeIt("legacy ")(mmrLegacyCached())
    timeIt("current")(graft.llm.EmbeddingOps.mmrRerank(emb))
    timeIt("legacy ")(mmrLegacyCached())
    timeIt("current")(graft.llm.EmbeddingOps.mmrRerank(emb))
    val a = mmrLegacyCached()
    val b = graft.llm.EmbeddingOps.mmrRerank(emb)
    println(s"identity: ${a.exceptAll(b).count()}/${b.exceptAll(a).count()} (want 0/0)")
    spark.stop()
  }
}
