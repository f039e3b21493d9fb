package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryRegistry}
import graft.oracle.OracleSql.{q => oq}

/** Corpus-maintenance operators for an evolving training corpus: snapshot
  * diffing (what changed between two corpus versions — the audit step before
  * any incremental re-train) and keyword retrieval (the inverted-index
  * dictionary plus a conjunctive scan-rank search used for corpus QA probes:
  * "which documents mention X and Y, ranked").
  *
  * Scale design:
  *  - [[corpusDiff]] digests each side BEFORE the join, so only
  *    `(doc_id, 32-char digest)` ever reaches the exchange — document text
  *    stays columnar in its scan and is never shuffled. At 100 TB the diff
  *    costs two narrow scans plus one digest-width shuffle.
  *  - [[keywordSearch]] is deliberately NOT built on the materialized index:
  *    for a fixed small term set, per-term tf columns are computed narrowly
  *    per document (zero shuffle) and ranked with a global top-k
  *    (TakeOrderedAndProject — k rows to the driver, never a full sort).
  *  - [[indexDictionary]] is the index's dictionary side (per-term df / tf
  *    stats): explode → two map-side-combined aggregates, output is
  *    vocabulary-sized.
  */
object CorpusOps extends QueryRegistry {

  private val words: Column = split(col("text"), " ")

  /** Snapshot-to-snapshot corpus delta: per-doc status
    * added / removed / changed / unchanged, decided on md5 digests computed
    * before the full-outer join (texts never shuffle). */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    val o = oldDocs.select(col("doc_id"), md5(col("text")).as("old_hash"))
    val n = newDocs.select(col("doc_id"), md5(col("text")).as("new_hash"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("old_hash"), col("new_hash"),
        when(col("old_hash").isNull, lit("added"))
          .when(col("new_hash").isNull, lit("removed"))
          .when(col("old_hash") =!= col("new_hash"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** The 4-row rollup of [[corpusDiff]] — the number an incremental
    * pipeline actually branches on ("0 changed → skip the rebuild"). */
  def corpusDiffSummary(oldDocs: DataFrame, newDocs: DataFrame): DataFrame =
    corpusDiff(oldDocs, newDocs).groupBy("status").agg(count(lit(1)).as("n_docs"))

  /** Per-term dictionary stats of the inverted index: document frequency,
    * total and max term frequency. Output is vocabulary-sized. */
  def indexDictionary(docs: DataFrame): DataFrame =
    TextOps.spread(docs)
      .select(col("doc_id"), explode(words).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
      .groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").as("total_tf"), max("tf").as("max_tf"))

  /** Conjunctive keyword search: documents containing ALL `terms`, ranked by
    * summed term frequency (ties broken by doc_id). Per-term tf columns are
    * narrow array scans — the whole query is scan → filter → top-k with no
    * exchange before the final TakeOrdered. */
  def keywordSearch(docs: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    val qTerms = terms.distinct
    val tfCols = qTerms.map(t =>
      size(filter(words, w => w === lit(t))).cast("long").as(s"tf_$t"))
    val scored = TextOps.spread(docs)
      .select(col("doc_id") +: tfCols: _*)
      .filter(qTerms.map(t => col(s"tf_$t") > 0).reduce(_ && _))
    scored
      .withColumn("score", qTerms.map(t => col(s"tf_$t")).reduce(_ + _))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  def defs: Seq[QueryDef] = Seq(
    // Deterministic v1/v2 derivation so the oracle sees the same snapshots:
    // v1 drops doc_id%7=3 (those become "added" in v2), v2 drops doc_id%5=2
    // ("removed") and rewrites doc_id%11=0 ("changed").
    QueryDef("doc_corpus_diff", (s, d) => {
      val base = TextOps.docs(s, d)
      corpusDiff(
        base.filter(col("doc_id") % 7 =!= 3),
        base.filter(col("doc_id") % 5 =!= 2)
          .withColumn("text", when(col("doc_id") % 11 === 0,
            concat(col("text"), lit(" v2"))).otherwise(col("text"))))
    }, Some(oq("""
      , dv1 AS (SELECT doc_id, md5(text) AS old_hash FROM documents
                WHERE doc_id % 7 <> 3),
      dv2 AS (SELECT doc_id,
                     md5(CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END) AS new_hash
              FROM documents WHERE doc_id % 5 <> 2)
      SELECT coalesce(dv1.doc_id, dv2.doc_id) AS doc_id, old_hash, new_hash,
             CASE WHEN old_hash IS NULL THEN 'added'
                  WHEN new_hash IS NULL THEN 'removed'
                  WHEN old_hash <> new_hash THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM dv1 FULL OUTER JOIN dv2 ON dv1.doc_id = dv2.doc_id"""))),

    QueryDef("doc_corpus_diff_summary", (s, d) => {
      val base = TextOps.docs(s, d)
      corpusDiffSummary(
        base.filter(col("doc_id") % 7 =!= 3),
        base.filter(col("doc_id") % 5 =!= 2)
          .withColumn("text", when(col("doc_id") % 11 === 0,
            concat(col("text"), lit(" v2"))).otherwise(col("text"))))
    }, Some(oq("""
      , dv1 AS (SELECT doc_id, md5(text) AS old_hash FROM documents
                WHERE doc_id % 7 <> 3),
      dv2 AS (SELECT doc_id,
                     md5(CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END) AS new_hash
              FROM documents WHERE doc_id % 5 <> 2),
      dd AS (
        SELECT CASE WHEN old_hash IS NULL THEN 'added'
                    WHEN new_hash IS NULL THEN 'removed'
                    WHEN old_hash <> new_hash THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM dv1 FULL OUTER JOIN dv2 ON dv1.doc_id = dv2.doc_id)
      SELECT status, count(*) AS n_docs FROM dd GROUP BY status"""))),

    QueryDef("doc_index_dictionary", (s, d) => indexDictionary(TextOps.docs(s, d)),
      Some(oq("""
      , iw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      ipost AS (SELECT term, doc_id, count(*) AS tf FROM iw GROUP BY term, doc_id)
      SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS total_tf,
             max(tf) AS max_tf
      FROM ipost GROUP BY term"""))),

    QueryDef("doc_keyword_search",
      (s, d) => keywordSearch(TextOps.docs(s, d), Seq("spark", "vector"), 25),
      Some(oq("""
      , kw AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      kscore AS (
        SELECT doc_id,
               CAST(len(list_filter(ws, x -> x = 'spark')) AS BIGINT) AS tf_spark,
               CAST(len(list_filter(ws, x -> x = 'vector')) AS BIGINT) AS tf_vector
        FROM kw)
      SELECT doc_id, tf_spark, tf_vector, tf_spark + tf_vector AS score
      FROM kscore WHERE tf_spark > 0 AND tf_vector > 0
      ORDER BY score DESC, doc_id LIMIT 25""")))
  )
}
