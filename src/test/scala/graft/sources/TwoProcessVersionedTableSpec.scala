package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The versioned-table protocol proven across a REAL process boundary
  * (r18, VERDICT r17 #6 — the TwoProcessCatalogSpec treatment for
  * `VersionedTable` itself): a reader PINNED in this process (the file
  * list resolves at DataFrame construction — the plan-time pin) must keep
  * serving its exact snapshot across a second JVM's commits AND its
  * vacuum, because the pinned version stays inside the child's retention
  * horizon and its files carry by reference; a vacuumed version must fail
  * loudly; and the child's head movement must be visible here through the
  * `_latest`/manifest reads alone — no shared memory, no cache pokes. */
class TwoProcessVersionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def spawnChild(root: String): (Int, String) = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val addOpens = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.map(_.toString)
      .sliding(2).collect { case Array("--add-opens", v) =>
        Seq("--add-opens", v) }.toSeq.flatten
    val cmd = Seq(javaBin) ++ addOpens ++ Seq("-Xmx3g",
      "-cp", System.getProperty("java.class.path"),
      "graft.tools.VersionedChild", root)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = scala.io.Source.fromInputStream(p.getInputStream, "UTF-8").mkString
    val rc = p.waitFor()
    (rc, out)
  }

  test("a parent-pinned reader survives a second JVM's commits and vacuum; the vacuumed version dies loudly") {
    val root = Files.createTempDirectory("graft_2proc_vt_").toString + "/t"
    VersionedTable.create(spark, root,
      (1L to 100L).map(i => (i, s"p_$i")).toDF("id", "payload")
        .repartitionByRange(4, col("id")))
    VersionedTable.updateWhere(spark, root, col("id") === 50L,
      Map("payload" -> lit("p_50_v2")))
    assert(VersionedTable.latestVersion(spark, root) === 2)

    // plan-time pins taken BEFORE the child exists: the head (v2) and the
    // about-to-be-vacuumed v1 — both DataFrames hold their file lists now
    val pinnedHead = VersionedTable.read(spark, root)
    val pinnedV1 = VersionedTable.read(spark, root, Some(1))
    assert(pinnedHead.count() === 100L) // materialized pre-child

    val (rc, out) = spawnChild(root)
    assert(rc == 0, s"child JVM failed (rc=$rc):\n${out.takeRight(4000)}")
    assert(out.contains("CHILD_OK v3=3 v4=4 dropped=1"), out.takeRight(1000))

    // the child's head is this process's current version, through the
    // _latest/manifest protocol alone
    assert(VersionedTable.latestVersion(spark, root) === 4)
    val head = VersionedTable.read(spark, root)
    assert(head.count() === 95L) // 100 - 10 deleted + 5 inserted
    assert(head.filter(col("id") <= 10L).count() === 0L)
    assert(head.filter(col("id") >= 201L).count() === 5L)

    // reader-pin semantics: the v2 pin still serves EXACTLY its snapshot —
    // the child's delete rewrote one file into the pool and its vacuum
    // retained v2, so every pinned path is alive and content-identical
    assert(pinnedHead.count() === 100L)
    assert(pinnedHead.filter(col("id") === 50L).select("payload")
      .head().getString(0) === "p_50_v2")
    assert(pinnedHead.filter(col("id") <= 10L).count() === 10L) // pre-delete rows

    // time travel to a RETAINED version works cross-process...
    assert(VersionedTable.read(spark, root, Some(2)).count() === 100L)
    assert(VersionedTable.changes(spark, root, 2, 4, Seq("id"))
      .filter(col("change_type") === "delete").count() === 10L)
    // ...the vacuumed v1 fails loudly, both as a fresh time travel and
    // through the stale pre-vacuum pin (its rewritten file left the pool)
    intercept[Exception] { VersionedTable.read(spark, root, Some(1)).count() }
    intercept[Exception] { pinnedV1.count() }
  }
}
