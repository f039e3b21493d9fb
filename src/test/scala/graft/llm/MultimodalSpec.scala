package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The multimodal decode path's scale contract: media bytes never leave the
  * executor that scanned them (no exchange anywhere in the decode plan), and
  * the typed batch shape survives the mapPartitions boundary. */
class MultimodalSpec extends SparkSpec {

  test("feature extraction is partition-local — no exchange in the plan") {
    val feats = MultimodalOps.decodePpm(MultimodalOps.ppmFixture(spark, sfDir))
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

  // -- the real P6 codec (r11) ---------------------------------------------

  private def p6(header: String, px: Int*): Array[Byte] =
    header.getBytes("US-ASCII") ++ px.map(_.toByte).toArray

  test("parsePpm decodes a hand-computed 2x2 image exactly") {
    val img = p6("P6\n2 2\n255\n",
      0, 10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110)
    val f = MultimodalOps.parsePpm(7L, img)
    assert(f === MultimodalOps.PpmFeatures(7L, 2, 2, 45.0, 55.0, 65.0))
  }

  test("parsePpm handles comments, multi-digit dims, and high bytes") {
    // 3x1, a comment line between magic and dims, channel values >127
    // (byte sign-extension is the classic decoder bug)
    val img = p6("P6\n# a comment\n3 1\n255\n",
      200, 0, 0, 250, 0, 0, 255, 0, 0)
    val f = MultimodalOps.parsePpm(1L, img)
    assert(f.width === 3 && f.height === 1)
    assert(f.mean_r === (200 + 250 + 255).toDouble / 3)
    assert(f.mean_g === 0.0 && f.mean_b === 0.0)
  }

  test("parsePpm rejects wrong magic, bad maxval, and truncated rasters") {
    intercept[IllegalArgumentException] {
      MultimodalOps.parsePpm(1L, p6("P5\n1 1\n255\n", 1, 2, 3)) // greyscale magic
    }
    intercept[IllegalArgumentException] {
      MultimodalOps.parsePpm(1L, p6("P6\n1 1\n65535\n", 1, 2, 3)) // 16-bit
    }
    intercept[IllegalArgumentException] {
      MultimodalOps.parsePpm(1L, p6("P6\n2 2\n255\n", 1, 2, 3)) // short raster
    }
  }

  test("fixture images round-trip through the decoder to their analytic features") {
    val feats = MultimodalOps.decodePpm(MultimodalOps.ppmFixture(spark, sfDir))
      .collect().map(f => f.doc_id -> f).toMap
    val ids = graft.llm.TextOps.docs(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(feats.keySet === ids)
    ids.foreach { id =>
      val f = feats(id)
      assert(f.width === 1 + (id % 64).toInt)
      assert(f.height === 1 + (id % 48).toInt)
      val n = f.width * f.height
      val er = (0 until n).map(p => (id + p) % 256).sum.toDouble / n
      assert(f.mean_r === er, s"doc $id")
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
