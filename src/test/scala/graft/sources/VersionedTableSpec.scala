package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Snapshot semantics of the versioned table: mutations commit new
  * versions, time travel pins old ones, orphans of crashed commits are
  * invisible, and vacuum retires exactly the asked-for history. */
class VersionedTableSpec extends SparkSpec {
  import spark.implicits._

  test("create → delete → merge → time travel across three versions") {
    val root = java.nio.file.Files.createTempDirectory("graft_vt_").toString + "/t"
    val v1 = (1L to 10L).map(i => (i, s"p_$i")).toDF("id", "payload")
    assert(VersionedTable.create(spark, root, v1) === 1)
    assert(VersionedTable.deleteWhere(spark, root, col("id") > 8L) === 2)
    assert(VersionedTable.mergeInto(spark, root,
      Seq((1L, "updated"), (11L, "inserted")).toDF("id", "payload"), Seq("id")) === 3)
    def ids(v: Option[Int]) =
      VersionedTable.read(spark, root, v).select("id").as[Long].collect().toSet
    assert(ids(Some(1)) === (1L to 10L).toSet)
    assert(ids(Some(2)) === (1L to 8L).toSet)
    assert(ids(None) === ((1L to 8L).toSet + 11L))
    assert(VersionedTable.read(spark, root, None)
      .filter(col("id") === 1L).select("payload").as[String].head() === "updated")
    assert(VersionedTable.latestVersion(spark, root) === 3)
  }

  test("an orphan version dir from a crashed commit is invisible and overwritten") {
    val root = java.nio.file.Files.createTempDirectory("graft_vt_o_").toString + "/t"
    VersionedTable.create(spark, root, Seq((1L, "a")).toDF("id", "payload"))
    // simulate a crash: v2 data written, manifest never swapped
    Seq((99L, "ghost")).toDF("id", "payload").write.parquet(s"$root/v00002")
    assert(VersionedTable.latestVersion(spark, root) === 1)
    assert(VersionedTable.read(spark, root).select("id").as[Long].collect().toSet === Set(1L))
    // the retried mutation claims v2 for itself
    assert(VersionedTable.deleteWhere(spark, root, col("id") < 0L) === 2)
    assert(VersionedTable.read(spark, root).select("id").as[Long].collect().toSet === Set(1L))
  }

  test("vacuum retires old versions and keeps time travel to the rest") {
    val root = java.nio.file.Files.createTempDirectory("graft_vt_v_").toString + "/t"
    VersionedTable.create(spark, root, Seq((1L, "a"), (2L, "b")).toDF("id", "payload"))
    VersionedTable.deleteWhere(spark, root, col("id") === 2L)
    VersionedTable.deleteWhere(spark, root, col("id") === 1L)
    assert(VersionedTable.vacuum(spark, root, keep = 2) === Seq(1))
    intercept[Exception] { VersionedTable.read(spark, root, Some(1)).collect() }
    assert(VersionedTable.read(spark, root, Some(2))
      .select("id").as[Long].collect().toSet === Set(1L))
    assert(VersionedTable.read(spark, root).count() === 0)
  }
}
