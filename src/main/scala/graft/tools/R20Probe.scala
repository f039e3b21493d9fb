package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe (r20 optimization round): interleaved A/B of each operator's
  * pre-r20 shape (inlined here) against the library's rewritten shape, in
  * ONE JVM with alternating reps so host drift cancels. Not part of the
  * shipped library. */
object R20Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "5").toInt
    val only = args.toSet
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()

    def ab(name: String)(oldF: => DataFrame)(newF: => DataFrame): Unit = {
      if (only.nonEmpty && !only.contains(name)) return
      def run(f: => DataFrame): Double = {
        val t0 = System.nanoTime(); noop(f); (System.nanoTime() - t0) / 1e9
      }
      run(oldF); run(newF) // untimed warm-up of both shapes
      val olds = collection.mutable.ArrayBuffer.empty[Double]
      val news = collection.mutable.ArrayBuffer.empty[Double]
      (1 to reps).foreach { _ => olds += run(oldF); news += run(newF) }
      def fmt(xs: Seq[Double]) =
        f"min ${xs.min}%.3f med ${xs.sorted.apply(xs.size / 2)}%.3f " +
          xs.map(x => f"$x%.3f").mkString("[", ",", "]")
      println(s"[r20] $name OLD ${fmt(olds.toSeq)}")
      println(s"[r20] $name NEW ${fmt(news.toSeq)}")
      println(f"[r20] $name ratio(new/old, mins) ${news.min / olds.min}%.3f")
    }

    val w = graft.etl.Warehouse(spark, sfDir)
    noop(w.factSalesElt); noop(w.dimDate) // build + warm caches, untimed
    val docs = graft.llm.TextOps.docs(spark, sfDir)
    val emb = graft.llm.EmbeddingOps.emb(spark, sfDir)

    // ---- olap_basket_lift: baskets localCheckpoint vs triple re-agg ----
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
    ab("basket_lift")(basketLiftOld())(graft.olap.Olap.basketLift(w))

    // ---- doc_lm_familiarity: corpus join vs bigram window ----
    val wordToks = split(col("text"), " ") // matches TextOps.wordTokens? see below
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
      val out = tf.join(corpus, Seq("bigram"))
        .groupBy("doc_id")
        .agg(sum("k").cast("long").as("n_bigrams"),
          sum(col("k") * col("c")).cast("long").as("attested_mass"))
        .select(col("doc_id"), col("n_bigrams"),
          (col("attested_mass").cast("double") / col("n_bigrams")).as("familiarity"))
      out
    }
    ab("lm_familiarity")(lmFamiliarityOld())(graft.llm.TextOps.lmFamiliarity(docs))

    // ---- doc_salient_terms: df join vs token window ----
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
    ab("salient_terms")(salientTermsOld())(graft.llm.TextOps.salientTerms(docs))

    // ---- emb_mmr_rerank: per-round window/join/checkpoint vs fused HOF ----
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
    ab("mmr_rerank")(mmrOld())(graft.llm.EmbeddingOps.mmrRerank(emb))

    // result-equality spot check for the mmr rewrite (beyond the oracle gate)
    if (only.isEmpty || only.contains("mmr_rerank")) {
      val a = mmrOld().collect().map(_.toString).sorted
      val b = graft.llm.EmbeddingOps.mmrRerank(emb).collect().map(_.toString).sorted
      println(s"[r20] mmr_rerank rows old=${a.length} new=${b.length} equal=${a.sameElements(b)}")
    }

    // ---- doc_bpe_merges: unconditional fold (old) vs containment precheck ----
    if (only.isEmpty || only.contains("bpe")) {
      import spark.implicits._
      def bpeOld(nMerges: Int = 10): DataFrame = {
        val wordsC = split(col("text"), " ")
        val wordFreq = docs.select(explode(wordsC).as("word"))
          .groupBy("word").agg(count(lit(1)).as("freq"))
        var syms = wordFreq
          .select(col("word"), col("freq"), split(col("word"), "").as("syms"))
          .localCheckpoint()
        val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
        var done = false
        for (i <- 1 to nMerges if !done) {
          val pairArr = when(size(col("syms")) >= 2,
            transform(sequence(lit(1), size(col("syms")) - 1),
              k => struct(element_at(col("syms"), k).as("l"),
                element_at(col("syms"), k + 1).as("r"))))
            .otherwise(array().cast("array<struct<l:string,r:string>>"))
          val pairs = syms.select(col("freq"), explode(pairArr).as("p"))
            .groupBy(col("p.l").as("l"), col("p.r").as("r"))
            .agg(sum("freq").as("cnt"))
          val best = pairs.orderBy(col("cnt").desc, col("l"), col("r")).limit(1).collect()
          if (best.isEmpty) done = true
          else {
            val (l, r, cnt) =
              (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
            merges += ((i, l, r, cnt))
            syms = syms.withColumn("syms",
                aggregate(col("syms"), array().cast("array<string>"),
                  (acc, x) => when(size(acc) > 0 &&
                      element_at(acc, -1) === lit(l) && x === lit(r),
                    concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
                    .otherwise(concat(acc, array(x)))))
              .localCheckpoint()
          }
        }
        merges.toSeq.toDF("merge_rank", "lhs", "rhs", "pair_count")
      }
      ab("bpe_merges")(bpeOld())(graft.llm.TextOps.bpeMerges(docs))
      val a = bpeOld().collect().map(_.toString).sorted
      val b = graft.llm.TextOps.bpeMerges(docs).collect().map(_.toString).sorted
      println(s"[r20] bpe_merges rows old=${a.length} new=${b.length} equal=${a.sameElements(b)}")
    }

    // ---- doc_quality_gopher: HOF folds vs arithmetic/intersect ----
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
    ab("quality_gopher")(gopherOld())(graft.llm.TextOps.qualityGopher(docs))
    if (only.isEmpty || only.contains("quality_gopher")) {
      val a = gopherOld().collect().map(_.toString).sorted
      val b = graft.llm.TextOps.qualityGopher(docs).collect().map(_.toString).sorted
      println(s"[r20] quality_gopher rows old=${a.length} new=${b.length} equal=${a.sameElements(b)}")
    }

    // ---- salesParsed: dualTimestamp formatter vs regex-guarded cast ----
    if (only.isEmpty || only.contains("sales_parse")) {
      val stgS = graft.etl.Staging.sales(spark, sfDir)
      def oldParse: DataFrame = stgS.select(
        expr("""CASE WHEN substr(trim(saledate), 5, 1) = '-'
                 THEN try_to_timestamp(trim(saledate), 'yyyy-MM-dd HH:mm:ss')
                 ELSE try_to_timestamp(trim(saledate), 'dd/MM/yyyy HH:mm:ss') END""")
          .cast("timestamp_ntz").as("sale_ts"))
      def newParse: DataFrame = stgS.select(
        expr("""CASE WHEN substr(trim(saledate), 5, 1) = '-'
                 THEN CASE WHEN trim(saledate) RLIKE '^[0-9]{4}-[0-9]{2}-[0-9]{2} [0-9]{2}:[0-9]{2}:[0-9]{2}$'
                           THEN try_cast(trim(saledate) AS TIMESTAMP) END
                 ELSE try_to_timestamp(trim(saledate), 'dd/MM/yyyy HH:mm:ss') END""")
          .cast("timestamp_ntz").as("sale_ts"))
      ab("sales_parse")(oldParse)(newParse)
      val a = oldParse.collect().map(_.toString).sorted
      val b = newParse.collect().map(_.toString).sorted
      println(s"[r20] sales_parse rows old=${a.length} new=${b.length} equal=${a.sameElements(b)}")
    }

    // ---- olap_q6: pre-aggregated theta join (old) vs direct broadcast+agg ----
    if (only.isEmpty || only.contains("q6")) {
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
      ab("q6")(q6Old)(graft.olap.Olap.q6(w))
      val a = q6Old.collect().map(_.toString).sorted
      val b = graft.olap.Olap.q6(w).collect().map(_.toString).sorted
      println(s"[r20] q6 rows old=${a.length} new=${b.length} equal=${a.sameElements(b)}")
      if (!a.sameElements(b))
        a.zip(b).filter { case (x, y) => x != y }.take(5)
          .foreach { case (x, y) => println(s"[r20] q6 DIFF old=$x new=$y") }
    }

    // ---- warehouse build: range-shuffle cache layout (sampling pass) vs
    // hash shuffle + sortWithinPartitions (no sampling; per-batch min/max
    // stay tight because batches are built from partition-sorted rows) ----
    if (only.isEmpty || only.contains("build")) {
      import graft.etl.{Staging, Transforms}
      def buildWith(layout: DataFrame => DataFrame): Double = {
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        val stgC = Staging.customers(spark, sfDir)
        val stgP = Staging.products(spark, sfDir)
        val stgS = Staging.sales(spark, sfDir)
        val stgD = Staging.dates(spark, sfDir)
        val cb = Transforms.customersBase(stgC).cache()
        val dimCElt = Transforms.dimCustomerElt(cb).cache()
        val pd = Transforms.productsDedup(Transforms.productsBase(stgP)).cache()
        val median = Transforms.medianPrice(pd)
        val dimP = Transforms.dimProduct(pd, median).cache()
        val sp = Transforms.salesParsed(stgS)
        val sf = layout(Transforms.salesFinal(sp, dimP)).cache()
        val dimD = Transforms.dimDate(Transforms.tsDomain(sf, stgD)).cache()
        noop(Transforms.factSalesElt(sf, dimP, dimCElt).cache())
        noop(dimD)
        (System.nanoTime() - t0) / 1e9
      }
      def rangeL(df: DataFrame) =
        df.repartitionByRange(col("sale_ts"), col("invoiceid"))
      def hashSortL(df: DataFrame) =
        df.repartition(col("sale_ts"), col("invoiceid"))
          .sortWithinPartitions(col("sale_ts"), col("invoiceid"))
      buildWith(rangeL); buildWith(hashSortL) // warm-up
      val olds = collection.mutable.ArrayBuffer.empty[Double]
      val news = collection.mutable.ArrayBuffer.empty[Double]
      (1 to reps).foreach { _ => olds += buildWith(rangeL); news += buildWith(hashSortL) }
      println(s"[r20] build OLD(range) min ${olds.min} ${olds.map(x => f"$x%.3f")}")
      println(s"[r20] build NEW(hash+sort) min ${news.min} ${news.map(x => f"$x%.3f")}")
      println(f"[r20] build ratio(new/old, mins) ${news.min / olds.min}%.3f")
      // downstream rows under each layout (cache-batch pruning + star joins)
      def rowSuite(tag: String, layout: DataFrame => DataFrame): Unit = {
        buildWith(layout)
        val w2 = graft.etl.Warehouse(spark, sfDir) // memoized — rebuild inline:
        // NOTE: Warehouse.apply memoizes the FIRST build of this session, so
        // time the rows against a locally-constructed warehouse instead.
        val stgC = graft.etl.Staging.customers(spark, sfDir)
        val stgP = graft.etl.Staging.products(spark, sfDir)
        val stgS = graft.etl.Staging.sales(spark, sfDir)
        val cb = graft.etl.Transforms.customersBase(stgC)
        val dimCElt = graft.etl.Transforms.dimCustomerElt(cb)
        val pd = graft.etl.Transforms.productsDedup(graft.etl.Transforms.productsBase(stgP))
        val median = graft.etl.Transforms.medianPrice(pd)
        val dimP = graft.etl.Transforms.dimProduct(pd, median)
        val sf2 = layout(graft.etl.Transforms.salesFinal(
          graft.etl.Transforms.salesParsed(stgS), dimP))
        val factElt = graft.etl.Transforms.factSalesElt(sf2, dimP, dimCElt)
        // the cacheManager resolves by plan: factElt re-resolves to the cached
        // entry buildWith just created under this layout
        def t(name: String)(f: => DataFrame): Unit = {
          def run(): Double = { val t0 = System.nanoTime(); noop(f); (System.nanoTime() - t0) / 1e9 }
          run()
          val xs = (1 to reps).map(_ => run())
          println(f"[r20] $tag/$name min ${xs.min}%.3f " + xs.map(x => f"$x%.3f").mkString("[", ",", "]"))
        }
        t("datekey_range_sum")(
          factElt.filter(col("date_key").between(19960101000000L, 19961231235959L))
            .agg(sum("totalamount").as("rev")))
        t("composite_filter_sum")(
          factElt.filter(col("stockcode") === "1" &&
            col("date_key").between(19960101000000L, 19961231235959L))
            .agg(sum("totalamount").as("rev")))
        t("seq_scan_sum")(factElt.agg(sum("totalamount").as("rev")))
        t("star_join_like")(
          factElt.select("product_key", "totalamount")
            .join(dimP.select("product_key", "category"), Seq("product_key"))
            .groupBy("category").agg(sum("totalamount").as("rev")))
        t("molap_month_product_like")(
          factElt.select("date_key", "product_key", "totalamount", "quantity", "unitprice")
            .filter(col("date_key") =!= graft.FallbackDateKey)
            .groupBy(graft.monthOfDateKey(col("date_key")).as("month"), col("product_key"))
            .agg(sum("totalamount").cast("double").as("revenue"),
              sum("quantity").as("total_qty")))
        val _ = w2
      }
      rowSuite("rows-old", rangeL)
      rowSuite("rows-new", hashSortL)
      spark.sharedState.cacheManager.clearCache()
    }

    spark.stop()
  }
}
