package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe for the doc_vocab_top100 bench drift (VERDICT r9 #5): times the
  * shipped [[graft.llm.TextOps.vocabTopK]] against plan variants at
  * SPARK_GRAFT_SF_DIR to split the row into tokenize / distinct-agg / top-k
  * contributions. Not part of the shipped library. */
object VocabProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def t(name: String, reps: Int = 5)(f: => DataFrame): Unit = {
      noop(f) // warm-up
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); noop(f); (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-34s min ${runs.min}%.3f s  runs ${runs.map(r => f"$r%.3f").mkString(" ")}")
    }
    val docs = graft.llm.TextOps.docs(spark, sfDir)
    println(s"[probe] documents files=${docs.inputFiles.length} rows=${docs.count()}")

    val words = expr("""regexp_extract_all(text, '[A-Za-z0-9_]+', 0)""")

    t("shipped vocabTopK")(graft.llm.TextOps.vocabTopK(docs))
    t("tokenize+explode only")(
      docs.select(col("doc_id"), explode(words).as("token")))
    t("agg count only (no distinct)")(
      docs.select(col("doc_id"), explode(words).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n_occurrences"))
        .orderBy(col("n_occurrences").desc, col("token")).limit(100))
    t("two-phase (token,doc) pre-agg")(
      docs.select(col("doc_id"), explode(words).as("token"))
        .groupBy("token", "doc_id").agg(count(lit(1)).as("c"))
        .groupBy("token")
        .agg(sum("c").as("n_occurrences"), count(lit(1)).as("n_docs"))
        .orderBy(col("n_occurrences").desc, col("token")).limit(100))
    t("map-side per-doc token counts")(
      docs.select(col("doc_id"), explode(words).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
        .groupBy("token")
        .agg(sum("c").as("n_occurrences"), count(lit(1)).as("n_docs"))
        .orderBy(col("n_occurrences").desc, col("token")).limit(100))
    spark.stop()
  }
}
