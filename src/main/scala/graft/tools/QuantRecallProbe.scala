package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.llm.EmbeddingOps

/** Dev probe: recall evidence for the quantized ANN path (VERDICT r8 #6) —
  * the link between the int8 quantization report (`emb_quantize_int8`) and
  * the search path. Computes, per query of the standard `vec_id % 100 = 0`
  * set:
  *  - exact@5: brute-force cosine top-5 (ground truth)
  *  - float ANN@5: [[EmbeddingOps.annBucketed]]
  *  - int8 ANN@5: [[EmbeddingOps.annBucketedQuantized]]
  * and reports pairwise top-5 overlap (recall@5). Quantized-vs-float recall
  * isolates the quantization loss; each-vs-exact isolates the LSH bucket
  * loss. Results recorded in COVERAGE.md.
  */
object QuantRecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = EmbeddingOps.emb(spark, dir)
    val exact5 = EmbeddingOps.cosineTop10(emb)
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rn") <= 5).select("query_id", "neighbor_id")
    val floatAnn = EmbeddingOps.annBucketed(emb).select("query_id", "neighbor_id")
    val quantAnn = EmbeddingOps.annBucketedQuantized(emb).select("query_id", "neighbor_id")
    val multiAnn = EmbeddingOps.annMultiProbe(emb).select("query_id", "neighbor_id")

    def overlap(label: String, a: DataFrame, b: DataFrame): Unit = {
      val na = a.count(); val nb = b.count()
      val both = a.join(b, Seq("query_id", "neighbor_id"), "inner").count()
      println(f"[quant] $label%-24s |a|=$na%5d |b|=$nb%5d overlap=$both%5d recall=${both.toDouble / nb}%.4f")
    }
    println(s"[quant] dir=$dir queries=${exact5.select("query_id").distinct().count()}")
    overlap("float_ann vs exact5", floatAnn, exact5)
    overlap("int8_ann  vs exact5", quantAnn, exact5)
    overlap("int8_ann  vs float_ann", quantAnn, floatAnn)
    overlap("multiprobe vs exact5", multiAnn, exact5)
    spark.stop()
  }
}
