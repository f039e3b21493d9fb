package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The multimodal decode path's scale contract: media bytes never leave the
  * executor that scanned them (no exchange anywhere in the decode plan), and
  * the typed batch shape survives the mapPartitions boundary. */
class MultimodalSpec extends SparkSpec {

  test("feature extraction is partition-local — no exchange in the plan") {
    val feats = MultimodalOps.decodeFeatures(MultimodalOps.mediaAsDataset(spark, sfDir))
    val plan = feats.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("frame sampling explodes partition-local — no exchange, every 5th frame") {
    val frames = MultimodalOps.sampleFrames(spark, sfDir)
    val plan = frames.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    val idx = frames.select("frame_idx")
      .collect().map(_.getLong(0)).toSet
    assert(idx.forall(_ % 5 === 0))
    assert(frames.count() > 0)
  }

  test("stub features are deterministic functions of the payload bytes") {
    val feats = MultimodalOps.decodeFeatures(MultimodalOps.mediaAsDataset(spark, sfDir))
      .collect().map(f => f.doc_id -> f).toMap
    val lens = graft.llm.TextOps.docs(spark, sfDir)
      .select(col("doc_id"), length(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(feats.keySet === lens.keySet)
    lens.foreach { case (id, n) =>
      val f = feats(id)
      assert(f.n_bytes === n)
      assert(f.fake_width === n % 640)
      assert(f.fake_height === n / 640 + 1)
      assert(f.fake_frames === n % 30)
    }
    assert(feats.nonEmpty)
  }

  test("metadata struct carries mime, byte length, and content prefix") {
    val m = MultimodalOps.mediaTable(spark, sfDir)
      .select("meta.mime", "meta.n_bytes", "meta.prefix_hex").head()
    assert(m.getString(0) === "text/plain")
    assert(m.getInt(1) > 0)
    assert(m.getString(2).length === 8)
  }
}
