package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.SkippingIndex.Box

/** The manifest layer: soundness (never lose a row), effectiveness (skip
  * files a z-ordered layout makes skippable), and the null/empty edges. */
class SkippingIndexSpec extends SparkSpec {
  import spark.implicits._

  test("prunedRead equals the full-scan filter on a z-ordered layout, and skips files") {
    val rnd = new scala.util.Random(31)
    val df = (1 to 40000).map(_ => (rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
      .toDF("x", "y")
    val out = Files.createTempDirectory("graft_skip_").toString
    ZOrder.materializeZordered(df, out, Seq("x", "y"), bits = 6, numFiles = 16)
    val idx = SkippingIndex.build(spark, out, Seq("x", "y")).cache()

    val boxes = Seq(Box("x", 100L, 180L), Box("y", 700L, 800L))
    val pruned = SkippingIndex.prunedRead(spark, out, idx, boxes)
    val full = spark.read.parquet(out)
      .filter(col("x").between(100, 180) && col("y").between(700, 800))
    assert(pruned.count() === full.count())
    assert(pruned.exceptAll(full).count() === 0 && full.exceptAll(pruned).count() === 0)
    assert(full.count() > 0)

    val surviving = SkippingIndex.survivingFiles(idx, boxes)
    assert(surviving.size < 16, s"2-d box pruned nothing: ${surviving.size}/16 files")
  }

  test("a file whose indexed column is all null is kept, not skipped") {
    val out = Files.createTempDirectory("graft_skip_null_").toString
    Seq((1L, Some(5L)), (2L, Some(6L))).toDF("id", "v").coalesce(1).write.parquet(s"$out/d")
    Seq((3L, None: Option[Long]), (4L, None)).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(s"$out/d")
    val idx = SkippingIndex.build(spark, s"$out/d", Seq("v"))
    val files = SkippingIndex.survivingFiles(idx, Seq(Box("v", 100L, 200L)))
    // the data file [5,6] misses the box; the null-stats file must survive
    assert(files.size === 1)
    assert(SkippingIndex.prunedRead(spark, s"$out/d", idx, Seq(Box("v", 100L, 200L))).count() === 0)
  }

  test("no surviving files yields an empty frame with the layout's schema") {
    val out = Files.createTempDirectory("graft_skip_empty_").toString
    Seq((1L, 5L), (2L, 6L)).toDF("id", "v").write.parquet(s"$out/d")
    val idx = SkippingIndex.build(spark, s"$out/d", Seq("v"))
    val pruned = SkippingIndex.prunedRead(spark, s"$out/d", idx, Seq(Box("v", 100L, 200L)))
    assert(pruned.count() === 0)
    assert(pruned.columns.toSeq === Seq("id", "v"))
  }
}
