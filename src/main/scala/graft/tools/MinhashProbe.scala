package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage-by-stage cost of the MinHash near-dup pipeline. */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.llm.TextOps.docs(spark, dir).cache()
    docs.count()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val words = split(col("text"), " ")
    val n = size(words)
    val idx = when(n >= 3, sequence(lit(1), n - 2)).otherwise(expr("array()"))
    val shingleArr = transform(idx, i =>
      concat_ws(" ", element_at(words, i), element_at(words, i + 1), element_at(words, i + 2)))

    t("shingles only") {
      println("[probe]   " + docs.select(col("doc_id"), shingleArr.as("shs"))
        .agg(sum(size(col("shs")))).head())
    }
    val shs = docs.select(col("doc_id"), shingleArr.as("shs")).cache()
    t("materialize shs")(shs.count())
    t("sigs from cached shs") {
      val sigs = shs.select(col("doc_id"),
        transform(sequence(lit(0), lit(7)), h =>
          array_min(transform(col("shs"), sgl =>
            md5(concat(h.cast("string"), lit(":"), sgl))))).as("mh"))
      println("[probe]   " + sigs.agg(count(lit(1))).head())
    }
    t("sigs+bands+cand from cached") {
      val sigs = shs.select(col("doc_id"),
        transform(sequence(lit(0), lit(7)), h =>
          array_min(transform(col("shs"), sgl =>
            md5(concat(h.cast("string"), lit(":"), sgl))))).as("mh"))
      val bands = sigs.select(col("doc_id"),
        explode(transform(sequence(lit(0), lit(3)), b =>
          struct(b.cast("int").as("band"),
            md5(concat_ws("|", slice(col("mh"), b * 2 + 1, lit(2)))).as("band_key")))).as("bk"))
        .select(col("doc_id"), col("bk.band").as("band"), col("bk.band_key").as("band_key"))
      val a = bands.select(col("doc_id").as("doc_a"), col("band"), col("band_key"))
      val bb = bands.select(col("doc_id").as("doc_b"), col("band"), col("band_key"))
      val cand = a.join(bb, Seq("band", "band_key")).filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
      println("[probe]   cand=" + cand.count())
    }
    t("full minhashPairs")(println("[probe]   pairs=" +
      graft.llm.TextOps.minhashPairs(docs).count()))
    spark.stop()
  }
}
