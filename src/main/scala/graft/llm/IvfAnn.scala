package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryRegistry}

/** IVF-style approximate nearest neighbor: a k-means coarse quantizer builds
  * inverted lists; queries probe only the nearest `nProbe` centroid lists and
  * re-rank exactly within them.
  *
  * Deterministic by construction (so results are reproducible run-to-run and
  * cluster-to-cluster): centroids initialize from the k smallest `vec_id`s
  * and Lloyd iterations run a fixed count; assignment ties break toward the
  * lower centroid id.
  *
  * Scale shape: each Lloyd iteration is one narrow per-partition assignment
  * pass (centroids broadcast to executors) plus one `(centroid, dim)`
  * aggregation shuffle of k×dim rows; the search path touches only the
  * probed lists — never the full corpus per query. Registered without a SQL
  * oracle (k-means is not reasonably oracle-expressible); correctness is
  * covered by determinism + the recall test in IvfAnnSpec.
  */
object IvfAnn {

  final case class Vec(vec_id: Long, embedding: Array[Float])

  private[llm] def sqDist(a: Array[Float], c: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - c(i); s += d * d; i += 1 }
    s
  }

  private def nearest(v: Array[Float], cents: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue; var j = 0
    while (j < cents.length) {
      val d = sqDist(v, cents(j))
      if (d < bestD) { bestD = d; best = j } // strict < : ties keep lower id
      j += 1
    }
    best
  }

  /** Train the coarse quantizer; returns the k×dim centroid matrix. The
    * vector cache lives only for the training loop (seed take + each Lloyd
    * pass) and unpersists before returning — `train` is called repeatedly by
    * the bench and a leaked entry per call is re-cache warning spam at best
    * (VERDICT r6 #4). */
  def train(emb: DataFrame, k: Int = 16, iters: Int = 2): Array[Array[Double]] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val ds = emb.select("vec_id", "embedding").as[Vec].cache()
    try {
      var cents = ds.orderBy("vec_id").take(k).map(_.embedding.map(_.toDouble))
      for (_ <- 1 to iters) {
        val bc = spark.sparkContext.broadcast(cents)
        val means = ds
          .mapPartitions(_.map(v => (nearest(v.embedding, bc.value), v.embedding)))
          .toDF("cid", "e")
          .select(col("cid"), posexplode(col("e")))
          .groupBy("cid", "pos")
          .agg(avg("col").as("m"))
          .collect()
        val next = cents.map(_.clone())
        means.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
        cents = next
      }
      cents
    } finally { ds.unpersist(); () }
  }

  /** Inverted-list assignment: vec_id → centroid id. */
  def assignments(emb: DataFrame, cents: Array[Array[Double]]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cents)
    emb.select("vec_id", "embedding").as[Vec]
      .mapPartitions(_.map(v => (v.vec_id, nearest(v.embedding, bc.value))))
      .toDF("vec_id", "centroid_id")
  }

  /** ANN search: probe the `nProbe` nearest lists per query, exact cosine
    * re-rank, top-k (queries = vec_id % 100 == 0, as the LSH variant). */
  def search(emb: DataFrame, cents: Array[Array[Double]], nProbe: Int = 2, topK: Int = 5): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cents)
    val assigned = assignments(emb, cents)
    val probes = emb.filter(col("vec_id") % 100 === 0).select("vec_id", "embedding").as[Vec]
      .flatMap { v =>
        val byDist = bc.value.indices.sortBy(j => (sqDist(v.embedding, bc.value(j)), j))
        byDist.take(nProbe).map(cid => (v.vec_id, cid))
      }.toDF("query_id", "centroid_id")
    val candidates = probes
      .join(assigned, Seq("centroid_id"))
      .filter(col("vec_id") =!= col("query_id"))
    val qs = emb.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val scored = candidates
      .join(qs, Seq("query_id"))
      .join(emb.select("vec_id", "embedding"), Seq("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        EmbeddingOps.cosine(col("qe"), col("embedding")).as("cos"))
    val wnd = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rn", row_number().over(wnd))
      .filter(col("rn") <= topK)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos"), 6).cast("decimal(10,6)").cast("double").as("cosine"))
  }
}

/** Registry. Every IVF row is hash-checked: the seed quantizer
  * (`train(iters = 0)` — argmin squared distance to the k smallest-vec_id
  * embeddings), the full fixed 2-iteration Lloyd assignment, and the
  * probe + exact-re-rank search path, all unrolled as chained DuckDB CTEs.
  * IvfAnnSpec additionally covers determinism + recall vs brute force. */
object IvfAnnQueries extends QueryRegistry {

  private val K = 16
  private val Dim = 64

  // (x-c)^2 written as a product, not ^: DuckDB's ^ is pow(), which need not
  // be bit-identical to the multiplication the Scala kernel does
  private[llm] val sqlDiffSq =
    s"(CAST(e.embedding[i] AS DOUBLE) - CAST(c.ce[i] AS DOUBLE)) * " +
      s"(CAST(e.embedding[i] AS DOUBLE) - CAST(c.ce[i] AS DOUBLE))"

  private val seedOracle = s"""
      WITH cents AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding AS ce
        FROM embeddings ORDER BY vec_id LIMIT $K),
      dists AS (
        SELECT e.vec_id, c.cid,
               list_sum([$sqlDiffSq FOR i IN generate_series(1, $Dim)]) AS d
        FROM embeddings e CROSS JOIN cents c),
      ranked AS (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM dists)
      SELECT vec_id, cid AS centroid_id FROM ranked WHERE rn = 1"""

  /** One argmin-assignment pass against centroid CTE `cents` (double lists),
    * producing `<name>` = (vec_id, cid). Mirrors `IvfAnn.nearest`: strict-<
    * scan == ORDER BY (distance, cid). */
  private def assignCtes(cents: String, name: String): String = s"""
      ${name}_d AS (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY list_sum([$sqlDiffSq FOR i IN generate_series(1, $Dim)]), c.cid) AS rn
        FROM embeddings e CROSS JOIN $cents c),
      $name AS (SELECT vec_id, cid FROM ${name}_d WHERE rn = 1)"""

  /** One Lloyd mean update from assignment `assign` over previous centroids
    * `prev`, producing `<name>` = (cid, ce): per-dimension avg of the
    * assigned vectors; a centroid with an empty list keeps its previous
    * coordinates (exactly `IvfAnn.train`'s cell-preserving update — when a
    * cid has any vector, all $Dim dims are present). */
  private def meanCtes(assign: String, prev: String, name: String): String = s"""
      ${name}_m AS (
        SELECT a.cid, t.i AS pos, avg(CAST(e.embedding[t.i] AS DOUBLE)) AS m
        FROM $assign a
        JOIN embeddings e ON a.vec_id = e.vec_id
        CROSS JOIN generate_series(1, $Dim) t(i)
        GROUP BY a.cid, t.i),
      $name AS (
        SELECT p.cid, coalesce(mm.ce, p.ce) AS ce
        FROM $prev p
        LEFT JOIN (SELECT cid, list(m ORDER BY pos) AS ce FROM ${name}_m GROUP BY cid) mm
               ON p.cid = mm.cid)"""

  /** The fixed 2-iteration Lloyd path unrolled as chained CTEs:
    * seed → assign → mean → assign → mean → final assign. Deterministic by
    * the same construction as the Scala kernel (smallest-vec_id seeds, fixed
    * iteration count, lower-cid tie-break); the only cross-engine freedom is
    * double-summation order inside `avg`, ~1e-13 relative — far below the
    * centroid separation that decides an argmin. */
  private[llm] val lloyd2Ctes = s"""
      WITH seeds AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
               [CAST(embedding[i] AS DOUBLE) FOR i IN generate_series(1, $Dim)] AS ce
        FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT $K) s),
      ${assignCtes("seeds", "a1")},
      ${meanCtes("a1", "seeds", "c1")},
      ${assignCtes("c1", "a2")},
      ${meanCtes("a2", "c1", "c2")},
      ${assignCtes("c2", "a3")}"""

  private val lloyd2Oracle = s"""
      $lloyd2Ctes
      SELECT vec_id, cid AS centroid_id FROM a3"""

  /** `IvfAnn.search` on the trained quantizer: each probe takes its nProbe=2
    * nearest trained centroids (same (distance, cid) order), candidates come
    * only from those inverted lists (each vector lives in exactly one list,
    * so no duplicate candidates), exact cosine re-rank, top-5. */
  private val lloyd2SearchOracle = s"""
      $lloyd2Ctes,
      probes_d AS (
        SELECT e.vec_id AS query_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY list_sum([$sqlDiffSq FOR i IN generate_series(1, $Dim)]), c.cid) AS rn
        FROM embeddings e CROSS JOIN c2 c
        WHERE e.vec_id % 100 = 0),
      probes AS (SELECT query_id, cid FROM probes_d WHERE rn <= 2),
      cands AS (
        SELECT p.query_id, a.vec_id
        FROM probes p JOIN a3 a ON p.cid = a.cid
        WHERE a.vec_id <> p.query_id),
      scored AS (
        SELECT cd.query_id, cd.vec_id AS neighbor_id,
               ${EmbeddingOps.sqlCos("q.embedding", "e.embedding")} AS cos
        FROM cands cd
        JOIN embeddings q ON q.vec_id = cd.query_id
        JOIN embeddings e ON e.vec_id = cd.vec_id),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
        FROM scored)
      SELECT query_id, neighbor_id,
             CAST(CAST(round(cos, 6) AS DECIMAL(10,6)) AS DOUBLE) AS cosine
      FROM ranked WHERE rn <= 5"""

  def defs: Seq[QueryDef] = Seq(
    QueryDef("emb_ivf_seed_assignments", (s, d) => {
      val e = EmbeddingOps.emb(s, d)
      IvfAnn.assignments(e, IvfAnn.train(e, k = K, iters = 0))
    }, Some(seedOracle)),
    QueryDef("emb_ivf_assignments", (s, d) => {
      val e = EmbeddingOps.emb(s, d)
      IvfAnn.assignments(e, IvfAnn.train(e))
    }, Some(lloyd2Oracle)),
    QueryDef("emb_ivf_search", (s, d) => {
      val e = EmbeddingOps.emb(s, d)
      IvfAnn.search(e, IvfAnn.train(e))
    }, Some(lloyd2SearchOracle)))
}
