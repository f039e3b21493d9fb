package graft.sources

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SURVEY §4 R2: ANALYZE-computed statistics drive a plan choice — the Spark
  * analog of the reference running `ANALYZE` before its join experiments
  * (`Iteration 2/Group No.6_JoinPerformance.sql:11-14`).
  *
  * The demonstration is the classic CBO selectivity case, with AQE OFF so the
  * initial (compile-time) plan is the one under test: a dim table larger than
  * the broadcast threshold, filtered down to a sliver by a range predicate.
  * Size-only estimation cannot see through the filter (a Filter keeps its
  * child's size estimate), so the join stays sort-merge; after
  * `ANALYZE ... FOR COLUMNS`, CBO's filter estimation uses min/max/ndv to
  * shrink the estimate below the threshold and the SAME query plans a
  * broadcast join. At 100 TB this is the first-stage broadcast decision AQE
  * cannot make — runtime shuffle sizes don't exist until after the stage
  * CBO's choice would have deleted. */
class CboStatsSpec extends SparkSpec {
  import spark.implicits._

  private def collectPlans(p: SparkPlan): Seq[SparkPlan] =
    p +: p.children.flatMap(collectPlans)

  private def joinNodes(df: org.apache.spark.sql.DataFrame): Seq[String] =
    collectPlans(df.queryExecution.executedPlan)
      .map(_.getClass.getSimpleName)
      .filter(_.contains("Join"))

  test("R2: ANALYZE column stats flip a filtered dim join to broadcast (AQE off)") {
    val pad = "x" * 64
    // ~40k rows × ~70B ≈ 2.8 MB on disk — well over the 64 KB threshold below
    spark.range(40000)
      .select(col("id").as("k"), concat(lit(pad), col("id")).as("payload"))
      .write.mode("overwrite").format("parquet").saveAsTable("r2_dim")
    val saved = Seq("spark.sql.adaptive.enabled", "spark.sql.cbo.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64 * 1024).toString)

      def query = spark.range(200000).select((col("id") % 40000).as("k"), col("id").as("v"))
        .join(spark.table("r2_dim").filter(col("k") < 100), Seq("k"))

      // no stats: the filter's estimate is the table's full size -> no broadcast
      assert(joinNodes(query).exists(_.contains("SortMergeJoin")),
        s"expected sort-merge before ANALYZE, got ${joinNodes(query)}")

      Sources.analyzeTable(spark, "r2_dim", columns = Seq("k"))

      // table-level stats landed in the catalog
      val stats = Sources.tableStats(spark, "r2_dim")
      assert(stats.rowCount.contains(BigInt(40000)))
      assert(stats.attributeStats.nonEmpty)

      // same query, stats present: selectivity ~100/40000 shrinks the filtered
      // side under the threshold -> compile-time broadcast
      assert(joinNodes(query).exists(_.contains("BroadcastHashJoin")),
        s"expected broadcast after ANALYZE, got ${joinNodes(query)}")
    } finally {
      saved.foreach { case (k, v) => v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
      spark.sql("DROP TABLE IF EXISTS r2_dim")
    }
  }
}
