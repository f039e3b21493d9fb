package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The prepared-statement surface: one planning, many serves, and the
  * versioned-table head check that forbids serving a stale snapshot. */
class PreparedSqlSpec extends SparkSpec {
  import spark.implicits._

  test("a handle over session views serves repeatedly from one pinned plan") {
    (1L to 100L).map(i => (i, i % 7)).toDF("id", "g")
      .createOrReplaceTempView("prep_base")
    val h = PreparedSql.prepare(spark,
      "SELECT g, count(1) AS n, sum(id) AS s FROM prep_base GROUP BY g")
    val p1 = h.executedPlan
    val r1 = h.run().as[(Long, Long, Long)].collect().toSet
    assert(r1.size === 7 && r1.toSeq.map(_._2).sum === 100L)
    // the SAME physical plan instance serves the second request — no
    // re-planning happened
    assert(h.executedPlan eq p1)
    assert(h.run().as[(Long, Long, Long)].collect().toSet === r1)
  }

  test("a handle over a versioned table rebuilds when the head moves, never serves stale") {
    val root = java.nio.file.Files.createTempDirectory("graft_prep_").toString + "/t"
    VersionedTable.create(spark, root,
      (1L to 50L).map(i => (i, i * 10L)).toDF("id", "qty"))
    val h = PreparedSql.prepare(spark,
      "SELECT CAST(sum(qty) AS BIGINT) AS total FROM t", Map("t" -> root))
    val p1 = h.executedPlan
    assert(h.run().as[Long].head() === (1L to 50L).map(_ * 10L).sum)
    // same head → same pinned plan
    assert(h.executedPlan eq p1)
    // a commit moves the head: the handle must re-plan and serve v2
    VersionedTable.updateWhere(spark, root, col("id") === 1L,
      Map("qty" -> lit(1000000L)))
    assert(h.run().as[Long].head() ===
      (2L to 50L).map(_ * 10L).sum + 1000000L)
    assert(!(h.executedPlan eq p1))
  }
}
