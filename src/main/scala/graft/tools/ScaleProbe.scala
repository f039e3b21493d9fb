package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: dedup/LSH scaling evidence (VERDICT r7 #3). Synthesizes a 10×
  * corpus from the sf0.1 documents — re-id'd copies, two near-duplicate
  * (salt word appended) and seven far (content words suffixed per copy so
  * each copy space replicates the original pair structure without
  * cross-space collisions; stopwords kept so the quality cascade still
  * passes them) — and times minhashPairs / dedupClusters (both execution
  * paths) / curationPipeline at 1× and 10×. Expected: ~linear-in-rows wall
  * growth for the LSH rows, and the distributed clustering path completing
  * without driver blow-up at the 10× edge count.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def t(label: String)(f: => DataFrame): Unit = {
      noop(f)
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); noop(f); (System.nanoTime() - t0) / 1e9
      }
      println(f"[scale] $label%-40s best ${runs.min}%8.2f s  (${runs.map(x => f"$x%.2f").mkString(", ")})")
    }

    val base = graft.llm.TextOps.docs(spark, dir)
    val offset = 10000000L
    val words = split(col("text"), " ")
    def reid(df: DataFrame, i: Int, text: org.apache.spark.sql.Column) = df.select(
      (col("doc_id") + i * offset).as("doc_id"), text.as("text"),
      col("lang"), col("source")).withColumn("n_chars", length(col("text")))
    // near copies: one appended salt word — stays a near-dup of the original
    def nearCopy(i: Int) = reid(base, i, concat(col("text"), lit(s" scalecopy$i")))
    // far copies: suffix every content word (stopwords kept for the cascade's
    // language gate) — a disjoint shingle space per copy that replicates the
    // original corpus's internal pair structure
    def farCopy(i: Int) = reid(base, i,
      array_join(transform(words,
        w => when(w === "the" || w === "a", w).otherwise(concat(w, lit(s"q$i")))), " "))
    val tenx = (Seq(base.withColumn("n_chars", length(col("text")))) ++
      (1 to 2).map(nearCopy) ++ (3 to 9).map(farCopy)).reduce(_.unionByName(_))

    // materialize to parquet so the 10× run scans a real multi-file source
    val tmp = java.nio.file.Files.createTempDirectory("graft_scale").toString
    try {
      tenx.repartition(32).write.mode("overwrite").parquet(s"$tmp/docs10x")
      val docs10 = spark.read.parquet(s"$tmp/docs10x")

      println(s"[scale] 1x docs: ${base.count()}   10x docs: ${docs10.count()}")
      val edges1 = graft.llm.TextOps.minhashPairs(base).filter(col("jaccard") >= 0.6).count()
      val edges10 = graft.llm.TextOps.minhashPairs(docs10).filter(col("jaccard") >= 0.6).count()
      println(s"[scale] 1x edges(j>=0.6): $edges1   10x edges: $edges10")

      t("1x  minhashPairs")(graft.llm.TextOps.minhashPairs(base))
      t("10x minhashPairs")(graft.llm.TextOps.minhashPairs(docs10))
      t("1x  dedupClusters (union-find)")(graft.llm.TextOps.dedupClusters(base))
      t("10x dedupClusters (size-gated)")(graft.llm.TextOps.dedupClusters(docs10))
      t("10x dedupClusters (forced distributed)")(
        graft.llm.TextOps.dedupClusters(docs10, broadcastEdgeLimit = 0L))
      t("1x  curationPipeline")(graft.llm.TextOps.curationPipeline(base))
      t("10x curationPipeline")(graft.llm.TextOps.curationPipeline(docs10))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
    spark.stop()
  }
}
