package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r16 decomposition probe: VERB-level timings for the versioned table at
  * sf0.01 vs sf0.1 — separates each gate pipeline's row-proportional
  * SCENARIO BUILD (creating the test table writes 10× rows by
  * construction) from the COMMIT VERBS the manifest format is supposed to
  * make change-proportional. Run: `runMain graft.tools.R16Decomp`. */
object R16Decomp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.sources.VersionedTable

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[r16decomp] $label%-36s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { sf =>
      println(s"== $sf")
      val events = graft.streaming.EventOps.events(spark, sf)
      val root = java.nio.file.Files
        .createTempDirectory("graft_r16d_").toString + "/t"
      t("create (partitioned, row-prop)") {
        VersionedTable.create(spark, root,
          events.withColumn("ubucket", expr("user_id div 5"))
            .repartition(col("ubucket")), Seq("ubucket"))
      }
      t("updateMove (sparse movers)") {
        VersionedTable.updateMove(spark, root,
          col("user_id") % 15 === 7,
          Map("user_id" -> (col("user_id") + 100000L),
            "ubucket" -> expr("(user_id + 100000) div 5")))
      }
      t("evolve (zero data I/O)") {
        VersionedTable.evolve(spark, root,
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("tag",
              org.apache.spark.sql.types.StringType))))
      }
      t("updateWhere (one-user repair)") {
        VersionedTable.updateWhere(spark, root, col("user_id") === 3L,
          Map("value" -> (col("value") * 2)))
      }
      t("appendBatch (1k-row batch)") {
        VersionedTable.appendBatch(spark, root, 1L,
          events.limit(1000).withColumn("ubucket", expr("user_id div 5"))
            .withColumn("tag", lit(null).cast("string")))
      }
      t("restore (manifest share)") {
        VersionedTable.restore(spark, root, 2)
      }
      t("read head count") {
        VersionedTable.read(spark, root).count()
      }
    }

    // many-commits axis (r16-late): per-commit cost must stay FLAT as
    // versions, manifest segments and pool files ACCUMULATE — the inline
    // coalesce bounds the list length, the segment cache keeps publish
    // reads in-memory, and a micro-batch commit pays only its own bytes.
    // This is the axis a streaming table ages along; growth here would be
    // a wall at 100 TB no matter how change-proportional one commit is.
    println("== many-commits axis: 60 consecutive 1k-row appendBatch commits (sf0.01)")
    val ev01 = graft.streaming.EventOps.events(spark, "/root/testdata/sf0.01")
    val root2 = java.nio.file.Files
      .createTempDirectory("graft_r16d_many_").toString + "/t"
    VersionedTable.create(spark, root2, ev01.limit(5000))
    val batch = ev01.limit(1000).cache()
    batch.count()
    val times = (1 to 60).map { i =>
      val t0 = System.nanoTime()
      VersionedTable.appendBatch(spark, root2, i.toLong, batch)
      (System.nanoTime() - t0) / 1e9
    }
    val segs = VersionedTable.snapshotSegRefs(spark, root2, 61)
    println(f"[r16decomp] appendBatch commits 1-5 avg ${times.take(5).sum / 5}%.3f s" +
      f"  56-60 avg ${times.takeRight(5).sum / 5}%.3f s" +
      f"  (manifest list ${segs.size} segments after 61 versions)")
    spark.stop()
  }
}
