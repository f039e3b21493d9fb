package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool (r20 optimization round): writes `plans/r20/<query>_before.txt`
  * and `..._after.txt` — the `.explain("formatted")` output of each touched
  * operator's pre-r20 shape (inlined here, byte-matching the shapes removed
  * from the library this round) and its current library shape. Executed
  * through the same QueryExecution the explain prints (toRdd.count()), so
  * AQE-final plans are dumped, like tools/PlanDump. Not part of the shipped
  * library. */
object R20PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val w = graft.etl.Warehouse(spark, sfDir)
    val docs = graft.llm.TextOps.docs(spark, sfDir)
    val emb = graft.llm.EmbeddingOps.emb(spark, sfDir)

    val outDir = java.nio.file.Paths.get("plans/r20")
    java.nio.file.Files.createDirectories(outDir)
    def dump(name: String, side: String, df: DataFrame): Unit = {
      df.queryExecution.toRdd.count()
      val full = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).trim
      val lines = full.linesIterator.toSeq
      val kept = if (lines.size <= 220) lines
        else lines.take(220) :+ s"... [${lines.size - 220} detail lines truncated]"
      java.nio.file.Files.writeString(outDir.resolve(s"${name}_$side.txt"),
        kept.mkString("", "\n", "\n"))
      println(s"[r20-plans] wrote $name.$side")
    }

    // ---- olap_q6 ----
    def q6Old: DataFrame = {
      val signup = w.dimCustomerElt
        .filter(col("signupdate").isNotNull)
        .select(col("customer_key").as("s_key"),
          trunc(col("signupdate"), "month").as("signup_month"))
      val revenue = w.factSalesElt
        .filter(col("date_key") =!= graft.FallbackDateKey)
        .groupBy(col("customer_key").as("r_key"),
          graft.monthOfDateKey(col("date_key")).as("sale_month"))
        .agg(sum("totalamount").as("revenue"))
      signup
        .join(revenue,
          col("r_key") === col("s_key") &&
            col("sale_month") >= col("signup_month") &&
            col("sale_month") < add_months(col("signup_month"), 3),
          "left")
        .groupBy("signup_month")
        .agg(
          sum(when(col("sale_month") === col("signup_month"), col("revenue")).otherwise(lit(0)))
            .cast("decimal(18,2)").cast("double").as("month0_revenue"),
          sum(when(col("sale_month") === add_months(col("signup_month"), 1), col("revenue")).otherwise(lit(0)))
            .cast("decimal(18,2)").cast("double").as("month1_revenue"),
          sum(when(col("sale_month") === add_months(col("signup_month"), 2), col("revenue")).otherwise(lit(0)))
            .cast("decimal(18,2)").cast("double").as("month2_revenue"))
    }
    dump("olap_q6", "before", q6Old)
    dump("olap_q6", "after", graft.olap.Olap.q6(w))

    // ---- olap_basket_lift ----
    def basketLiftOld(minPairN: Long = 2, maxBasket: Int = 50): DataFrame = {
      val sales = w.salesFinal.select("invoiceid", "stockcode")
      val baskets = sales
        .groupBy("invoiceid")
        .agg(sort_array(collect_set(col("stockcode"))).as("items"))
        .filter(size(col("items")).between(2, maxBasket))
      val items = baskets.select(col("invoiceid"), explode(col("items")).as("stockcode"))
      val itemN = items.groupBy("stockcode").agg(count(lit(1)).as("n"))
      val total = baskets.agg(count(lit(1)).as("n_baskets"))
      val pairs = baskets.select(explode(expr(
        """flatten(transform(items,
           (x, i) -> transform(slice(items, i + 2, size(items)),
                               y -> struct(x AS s1, y AS s2))))""")).as("p"))
        .select(col("p.s1").as("s1"), col("p.s2").as("s2"))
        .groupBy("s1", "s2").agg(count(lit(1)).as("pair_n"))
        .filter(col("pair_n") >= minPairN)
      pairs
        .join(broadcast(itemN.withColumnRenamed("stockcode", "s1").withColumnRenamed("n", "n1")), Seq("s1"))
        .join(broadcast(itemN.withColumnRenamed("stockcode", "s2").withColumnRenamed("n", "n2")), Seq("s2"))
        .crossJoin(broadcast(total))
        .select(col("s1"), col("s2"), col("pair_n"), col("n1"), col("n2"),
          (col("pair_n").cast("double") / col("n_baskets")).as("support"),
          (col("pair_n").cast("double") / col("n1")).as("conf_1_to_2"),
          (col("pair_n").cast("double") / col("n2")).as("conf_2_to_1"),
          ((col("pair_n") * col("n_baskets")).cast("double") / (col("n1") * col("n2"))).as("lift"))
    }
    dump("olap_basket_lift", "before", basketLiftOld())
    dump("olap_basket_lift", "after", graft.olap.Olap.basketLift(w))

    // ---- doc_lm_familiarity ----
    def lmFamiliarityOld(): DataFrame = {
      val toks = graft.llm.TextOpsProbeAccess.wordTokens
      val n = size(toks)
      val idx = when(n >= 2, sequence(lit(1), n - 1)).otherwise(expr("array()"))
      val bigrams = transform(idx, i =>
        concat_ws(" ", element_at(toks, i), element_at(toks, i + 1)))
      val tf = graft.llm.TextOpsProbeAccess.spread(docs)
        .select(col("doc_id"), explode(bigrams).as("bigram"))
        .groupBy("doc_id", "bigram").agg(count(lit(1)).as("k"))
        .cache()
      val corpus = tf.groupBy("bigram").agg(sum("k").as("c"))
      tf.join(corpus, Seq("bigram"))
        .groupBy("doc_id")
        .agg(sum("k").cast("long").as("n_bigrams"),
          sum(col("k") * col("c")).cast("long").as("attested_mass"))
        .select(col("doc_id"), col("n_bigrams"),
          (col("attested_mass").cast("double") / col("n_bigrams")).as("familiarity"))
    }
    dump("doc_lm_familiarity", "before", lmFamiliarityOld())
    dump("doc_lm_familiarity", "after", graft.llm.TextOps.lmFamiliarity(docs))

    // ---- doc_salient_terms ----
    def salientTermsOld(k: Int = 3): DataFrame = {
      val toks = graft.llm.TextOpsProbeAccess.spread(docs)
        .select(col("doc_id"), explode(graft.llm.TextOpsProbeAccess.wordTokens).as("token"))
      val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf")).cache()
      val dfq = tf.groupBy("token").agg(count(lit(1)).as("df"))
      val wnd = Window.partitionBy("doc_id").orderBy(col("score").desc, col("token"))
      tf.join(dfq, Seq("token"))
        .withColumn("score", col("tf").cast("double") / col("df"))
        .withColumn("rank", row_number().over(wnd))
        .filter(col("rank") <= k)
        .select(col("doc_id"), col("token"), col("tf"), col("df"),
          col("score"), col("rank").cast("long").as("rank"))
    }
    dump("doc_salient_terms", "before", salientTermsOld())
    dump("doc_salient_terms", "after", graft.llm.TextOps.salientTerms(docs))

    // ---- doc_quality_gopher ----
    def gopherOld(): DataFrame = {
      val words = split(col("text"), " ")
      val n = size(words)
      val lines = split(col("text"), "\n")
      val nLines = size(lines)
      val wordChars = aggregate(transform(words, w => length(w)), lit(0), (a, x) => a + x)
      val meanWl = wordChars.cast("double") / n
      val nHash = length(col("text")) - length(regexp_replace(col("text"), "#", ""))
      val nEll = (length(col("text")) -
        length(regexp_replace(col("text"), "\\.\\.\\.", ""))) / lit(3)
      val symbolRatio = (nHash + nEll).cast("double") / n
      val bulletRatio = size(filter(lines,
        l => startswith(l, lit("-")) || startswith(l, lit("*")))).cast("double") / nLines
      val ellLineRatio = size(filter(lines,
        l => endswith(l, lit("...")))).cast("double") / nLines
      val alphaRatio = size(filter(words, w => w.rlike("[A-Za-z]"))).cast("double") / n
      val stopHits = size(filter(
        array(Seq("the", "be", "to", "of", "and", "that", "have", "with").map(lit): _*),
        s => array_contains(words, s)))
      val firstFail =
        when(n < 50 || n > 100000, lit("word_count"))
          .when(meanWl < 3.0 || meanWl > 10.0, lit("mean_word_length"))
          .when(symbolRatio > 0.1, lit("symbol_ratio"))
          .when(bulletRatio > 0.9, lit("bullet_lines"))
          .when(ellLineRatio > 0.3, lit("ellipsis_lines"))
          .when(alphaRatio < 0.8, lit("alpha_words"))
          .when(stopHits < 2, lit("stopwords"))
      docs.select(
        col("doc_id"), n.as("n_words"), meanWl.as("mean_word_len"),
        symbolRatio.as("symbol_ratio"), bulletRatio.as("bullet_ratio"),
        ellLineRatio.as("ellipsis_line_ratio"), alphaRatio.as("alpha_ratio"),
        stopHits.as("n_stop_hits"), firstFail.as("first_fail"),
        firstFail.isNull.as("keep"))
    }
    dump("doc_quality_gopher", "before", gopherOld())
    dump("doc_quality_gopher", "after", graft.llm.TextOps.qualityGopher(docs))

    // ---- emb_mmr_rerank ----
    def mmrOld(k: Int = 5, nCand: Int = 20): DataFrame = {
      val e = emb.select("vec_id", "embedding")
      val qs = e.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      def r6(c: Column): Column = round(c, 6).cast("decimal(10,6)").cast("double")
      def cosine(a: Column, b: Column) = graft.llm.EmbeddingOps.cosine(a, b)
      val wnd = Window.partitionBy("query_id").orderBy(col("raw").desc, col("cand_id"))
      var state = broadcast(qs).crossJoin(e)
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("cand_id"), col("embedding"),
          cosine(col("qe"), col("embedding")).as("raw"))
        .withColumn("rn", row_number().over(wnd)).filter(col("rn") <= nCand)
        .select(col("query_id"), col("cand_id"), col("embedding"),
          r6(col("raw")).as("rel"), lit(-1.0).as("max_sim"))
        .localCheckpoint()
      var picks: DataFrame = null
      for (r <- 1 to k) {
        val sw = Window.partitionBy("query_id")
          .orderBy((lit(0.7) * col("rel") - lit(0.3) * col("max_sim")).desc, col("cand_id"))
        val sel = state.withColumn("srn", row_number().over(sw))
          .filter(col("srn") === 1)
          .select(col("query_id"), col("cand_id"), col("embedding"), col("rel"))
          .localCheckpoint()
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
            .localCheckpoint()
      }
      picks
    }
    dump("emb_mmr_rerank", "before", mmrOld())
    dump("emb_mmr_rerank", "after", graft.llm.EmbeddingOps.mmrRerank(emb))

    // ---- warehouse salesFinal cache layout (the build's one big shuffle) ----
    val sp = graft.etl.Transforms.salesParsed(graft.etl.Staging.sales(spark, sfDir))
    val sfBase = graft.etl.Transforms.salesFinal(sp, w.dimProduct)
    dump("warehouse_salesfinal_layout", "before",
      sfBase.repartitionByRange(col("sale_ts"), col("invoiceid")))
    dump("warehouse_salesfinal_layout", "after",
      sfBase.repartition(col("sale_ts"), col("invoiceid"))
        .sortWithinPartitions(col("sale_ts"), col("invoiceid")))

    spark.stop()
  }
}
