package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.EmbeddingOps

/** Dev probe: scaling evidence for the EMBEDDING dedup/ANN channel
  * (VERDICT r8 #5) — the semantic twin of [[ScaleProbe]]'s lexical evidence.
  * Synthesizes a 10× corpus from the sf0.1 embeddings: two near-copies
  * (per-element perturbation small enough to stay in the original's LSH
  * bucket most of the time) and seven far copies (array rotation — a
  * different direction entirely, scattering across buckets), then measures:
  *  - bucket-mass growth: Σ n_b² over LSH buckets (the candidate-pair count
  *    the bucket equi-join actually materializes) at 1× and 10× — the number
  *    that must grow ~quadratically-in-bucket-size but stay FAR below the
  *    all-pairs n², proving the banded join never degenerates;
  *  - wall time for cosineNearDup / annBucketed / embDedupClusters at both
  *    scales (expected ~linear in candidate mass).
  */
object EmbScaleProbe {
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
      println(f"[embscale] $label%-36s best ${runs.min}%8.2f s  (${runs.map(x => f"$x%.2f").mkString(", ")})")
    }

    val base = EmbeddingOps.emb(spark, dir)
    val offset = 10000000L
    def reid(i: Int, e: org.apache.spark.sql.Column) = base.select(
      (col("vec_id") + i * offset).as("vec_id"), e.as("embedding"), col("label"))
    // near copies: tiny deterministic per-element nudge — most stay near-dups
    def nearCopy(i: Int) = reid(i,
      transform(col("embedding"), x => (x + lit(0.001f * i)).cast("float")))
    // far copies: rotate the array by i dims — a different direction,
    // scattering across buckets (replicates pair structure per copy space)
    def farCopy(i: Int) = reid(i,
      concat(slice(col("embedding"), i + 1, 64 - i), slice(col("embedding"), 1, i)))
    val tenx = (Seq(base.select("vec_id", "embedding", "label")) ++
      (1 to 2).map(nearCopy) ++ (3 to 9).map(farCopy)).reduce(_.unionByName(_))

    val tmp = java.nio.file.Files.createTempDirectory("graft_embscale").toString
    try {
      tenx.repartition(32).write.mode("overwrite").parquet(s"$tmp/emb10x")
      val emb10 = spark.read.parquet(s"$tmp/emb10x")

      def mass(e: DataFrame): (Long, Long) = {
        val r = EmbeddingOps.lshBucketSizes(e)
          .agg(sum(col("n_vectors")).as("n"),
            sum(col("n_vectors") * col("n_vectors")).as("m")).head()
        (r.getLong(0), r.getLong(1))
      }
      val (n1, m1) = mass(base); val (n10, m10) = mass(emb10)
      println(s"[embscale] 1x vectors: $n1  bucket candidate mass Σn²: $m1  (all-pairs ${n1.toLong * n1})")
      println(s"[embscale] 10x vectors: $n10  bucket candidate mass Σn²: $m10  (all-pairs ${n10.toLong * n10})")
      println(f"[embscale] mass growth ${m10.toDouble / m1}%.1fx for 10x rows; mass/all-pairs at 10x: ${m10.toDouble / (n10.toDouble * n10)}%.4f")

      t("1x  cosineNearDup")(EmbeddingOps.cosineNearDup(base))
      t("10x cosineNearDup")(EmbeddingOps.cosineNearDup(emb10))
      t("1x  annBucketed")(EmbeddingOps.annBucketed(base))
      t("10x annBucketed")(EmbeddingOps.annBucketed(emb10))
      t("1x  embDedupClusters")(EmbeddingOps.embDedupClusters(base))
      t("10x embDedupClusters")(EmbeddingOps.embDedupClusters(emb10))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
    spark.stop()
  }
}
