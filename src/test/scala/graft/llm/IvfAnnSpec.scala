package graft.llm

import graft.SparkSpec

/** IVF ANN: deterministic training, sane inverted lists, and measured recall
  * against the exact brute-force top-k. */
class IvfAnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = EmbeddingOps.emb(spark, sfDir)

  test("training is deterministic and assignments cover every vector once") {
    val c1 = IvfAnn.train(emb, k = 8, iters = 2)
    val c2 = IvfAnn.train(emb, k = 8, iters = 2)
    assert(c1.map(_.toSeq).toSeq === c2.map(_.toSeq).toSeq)
    val assigned = IvfAnn.assignments(emb, c1)
    assert(assigned.count() === emb.count())
    assert(assigned.select("centroid_id").distinct().count() > 1)
  }

  test("probing more lists improves (or maintains) recall vs brute force") {
    val cents = IvfAnn.train(emb)
    val brute = EmbeddingOps.cosineTop10(emb) // exact top-10 per query (superset of top-5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet

    def recall(nProbe: Int): Double = {
      val ann = IvfAnn.search(emb, cents, nProbe = nProbe, topK = 5)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      if (ann.isEmpty) 0.0 else ann.count(brute.contains).toDouble / ann.size
    }
    val r1 = recall(1)
    val r4 = recall(4)
    assert(r4 >= r1, s"recall should not degrade with more probes: r1=$r1 r4=$r4")
    assert(r4 > 0.0, "probing 4 of 16 lists should recover some exact top-10 hits")
  }
}
