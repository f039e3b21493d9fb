package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Corpus maintenance: snapshot diff semantics, keyword search vs a
  * brute-force re-rank, dictionary stats, and the MinHash estimator audit. */
class CorpusOpsSpec extends SparkSpec {

  private def frame(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("corpusDiff labels all four statuses") {
    val v1 = frame(1L -> "a b c", 2L -> "d e f", 3L -> "g h i")
    val v2 = frame(2L -> "d e f", 3L -> "g h i CHANGED", 4L -> "j k l")
    val got = CorpusOps.corpusDiff(v1, v2).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got === Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
    val sum = CorpusOps.corpusDiffSummary(v1, v2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sum === Map("removed" -> 1L, "unchanged" -> 1L, "changed" -> 1L, "added" -> 1L))
  }

  test("corpusDiff shuffles digests, not text") {
    val docs = TextOps.docs(spark, sfDir)
    val plan = CorpusOps.corpusDiff(docs, docs)
      .queryExecution.executedPlan.toString
    // the exchange inputs carry md5 projections; the raw text column must
    // not survive past the pre-join projection
    assert(!plan.contains("text#") ||
      !plan.linesIterator.exists(l => l.contains("Exchange") && l.contains("text#")))
  }

  test("keywordSearch matches a brute-force filter+sort") {
    val docs = TextOps.docs(spark, sfDir)
    val terms = Seq("spark", "vector")
    val k = 25
    val got = CorpusOps.keywordSearch(docs, terms, k).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score")))
    // brute force: count terms by exploding
    val brute = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w").isin(terms: _*))
      .groupBy("doc_id").pivot("w", terms).count()
      .na.fill(0L)
      .filter(col("spark") > 0 && col("vector") > 0)
      .select(col("doc_id"), (col("spark") + col("vector")).as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(k).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === brute.toSeq)
    // ranked output is deterministic: descending score, ascending doc_id ties
    assert(got.sliding(2).forall { case Array((d1, s1), (d2, s2)) =>
      s1 > s2 || (s1 == s2 && d1 < d2); case _ => true })
  }

  test("indexDictionary df/total_tf/max_tf agree with direct counts") {
    val docs = frame(1L -> "a b a", 2L -> "a c", 3L -> "c c c")
    val got = CorpusOps.indexDictionary(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      "a" -> ((2L, 3L, 2L)),
      "b" -> ((1L, 1L, 1L)),
      "c" -> ((2L, 4L, 3L))))
  }

  test("minhashAccuracy: identical docs estimate 1.0 exactly; errors bounded by construction") {
    val docs = frame(
      1L -> "w1 w2 w3 w4 w5 w6 w7 w8",
      2L -> "w1 w2 w3 w4 w5 w6 w7 w8",        // identical to 1
      3L -> "w1 w2 w3 w4 w5 w6 w7 DIFF",      // near-dup of 1
      4L -> "x1 x2 x3 x4 x5 x6 x7 x8")        // unrelated
    val rows = TextOps.minhashAccuracy(docs).collect()
    val byPair = rows.map(r => (r.getLong(0), r.getLong(1)) ->
      ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    // identical docs: exact = est = 1, error 0
    val (ej, sj, err) = byPair((1L, 2L))
    assert(ej === 1.0 && sj === 1.0 && err === 0.0)
    // every row: est in [0,1] in eighths, abs_err consistent
    rows.foreach { r =>
      val est = r.getDouble(3)
      assert(est >= 0.0 && est <= 1.0 && (est * 8).isWhole)
      assert(math.abs(r.getDouble(4) - math.abs(est - r.getDouble(2))) < 1e-15)
    }
    // candidates include the near-dup pair (shares a full band with doc 1)
    assert(byPair.contains((1L, 3L)))
  }
}
