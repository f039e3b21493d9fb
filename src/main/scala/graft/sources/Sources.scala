package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Source/sink surface (SURVEY.md §2.1).
  *
  * The reference's staging layer is schema-on-load: every column arrives as
  * TEXT and parsing happens in the transform step (reference staging DDL,
  * `Iteration 1/Group No.6_ETL.sql:22-58`). [[csvStaging]] reproduces that
  * contract for CSV inputs; the driver test data is parquet, read through
  * [[table]] (columnar scan + pushdown — the Spark-native analog of the
  * reference's heap tables, SURVEY.md §1.4).
  */
object Sources {

  /** S2: columnar table scan with Catalyst pushdown/pruning. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** S1: CSV → all-string staging DataFrame (header row expected). Keeping
    * every column StringType preserves dirty values for the cleaning layer. */
  def csvStaging(spark: SparkSession, path: String, columns: Seq[String]): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .schema(StructType(columns.map(StructField(_, StringType, nullable = true))))
      .csv(path)

  /** S3/S8: materialize a transform result (CTAS / materialized view). Facts
    * should pass a partition column (e.g. `year`) so 100 TB writes produce
    * prunable Hive-style directories (SURVEY.md §4 R6), and a sort column
    * (e.g. `date_key`) — the reference's B-tree-index analog (§4 R3): sorting
    * rows within each output file tightens parquet row-group min/max stats,
    * so range predicates skip row groups instead of scanning them. */
  def materialize(df: DataFrame, path: String, partitionBy: Seq[String] = Nil,
                  sortWithin: Seq[String] = Nil): Unit = {
    // the sort leads with the partition columns: the file writer requires
    // partition-column ordering and would otherwise insert its own (order-
    // destroying) sort on top of ours
    val sortCols = (partitionBy ++ sortWithin).distinct
    val sorted = if (sortWithin.nonEmpty) df.sortWithinPartitions(sortCols.map(df(_)): _*) else df
    val w = sorted.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Bucketed+sorted table layout — the reference's composite-index analog
    * (SURVEY.md §4 R5): hash-bucketing two tables on their join key lets the
    * planner co-locate the join with NO shuffle exchange on either side,
    * which at 100 TB turns every repeated fact⋈fact / fact⋈big-dim join
    * into a local merge. `sortBy` keeps each bucket ONE internally-sorted
    * file: the point lookup reads a single file with row-group min/max
    * pruning on the key, and deployments that opt into
    * `spark.sql.legacy.bucketedTableScan.outputOrdering` (Spark 3+
    * default-off — propagating the order makes the planner list files)
    * additionally drop the merge join's SortExecs (spec-asserted both
    * ways). NOTE (ADVICE r19): single-file-per-bucket is guaranteed only
    * with `sortBy` (or `buckets` >= the session's shuffle width) — an
    * UNSORTED table writes up to ceil(width/buckets) files per bucket to
    * keep write parallelism, so point lookups on it scan k files; callers
    * who relied on the r18 one-file layout should pass `sortBy`.
    * Catalog-backed (`saveAsTable`) because bucket metadata lives
    * in the table catalog. */
  def bucketTable(df: DataFrame, name: String, buckets: Int, key: String,
                  sortBy: Seq[String] = Nil, path: Option[String] = None): Unit = {
    // Key-aligned pre-partitioning (r18, width fix r19): a bucketed write
    // emits a file per (input partition × bucket), so an N-partition input
    // fragments every bucket into N files and the point lookup that
    // bucketing exists for scans N splits instead of one. Repartitioning
    // by the bucket key into a MULTIPLE k·buckets of the bucket count uses
    // the same murmur3-pmod family as the bucket spec (h mod k·b ≡
    // h mod b), so every partition holds rows of exactly ONE bucket — each
    // bucket lands in k files, not N. k is sized so the write keeps the
    // session's full parallelism: collapsing to exactly `buckets`
    // partitions when buckets << cores would serialize a large table's
    // write into a few huge tasks (ADVICE r18).
    // A SORTED layout stays at k = 1 regardless: the scan propagates the
    // per-bucket sort order (the no-SortExec merge-join guarantee `sortBy`
    // exists to buy) only while each bucket is a single file, so sorted
    // tables trade write width for the guarantee — at scale, size
    // `buckets` >= the cluster width and the trade vanishes.
    val width = df.sparkSession.sessionState.conf.numShufflePartitions
    val parts =
      if (sortBy.nonEmpty) buckets
      else math.max(buckets, (width + buckets - 1) / buckets * buckets)
    val pre = df.repartition(parts, org.apache.spark.sql.functions.col(key))
    val w0 = pre.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    val w1 = path.fold(w0)(p => w0.option("path", p)) // external table when given
    (if (sortBy.nonEmpty) w1.sortBy(sortBy.head, sortBy.tail: _*) else w1)
      .saveAsTable(name)
  }

  /** R2: cost-based-optimizer statistics — the Spark analog of the
    * reference's `ANALYZE` / `VACUUM ANALYZE` step before its join
    * experiments (`Iteration 2/Group No.6_JoinPerformance.sql:11-14`,
    * `README.md:134-136`). Computes table-level statistics (rowCount,
    * sizeInBytes) and, when columns are given, per-column histograms-lite
    * (ndv, min/max, null count) into the catalog, so with
    * `spark.sql.cbo.enabled` Catalyst estimates FILTER SELECTIVITY and join
    * sides from data rather than raw file sizes — the decision AQE can only
    * make one shuffle too late: a first-stage broadcast choice needs stats
    * before any runtime sizes exist. Catalog-backed tables only (stats live
    * in the catalog, like bucket metadata in [[bucketTable]]). */
  def analyzeTable(spark: SparkSession, name: String, columns: Seq[String] = Nil): Unit = {
    spark.sql(s"ANALYZE TABLE `$name` COMPUTE STATISTICS")
    if (columns.nonEmpty)
      spark.sql(s"ANALYZE TABLE `$name` COMPUTE STATISTICS FOR COLUMNS " +
        columns.map(c => s"`$c`").mkString(", "))
  }

  /** The optimizer's current statistics for a catalog table — rowCount is
    * defined only after [[analyzeTable]]; attributeStats only for analyzed
    * columns. */
  def tableStats(spark: SparkSession, name: String)
      : org.apache.spark.sql.catalyst.plans.logical.Statistics =
    spark.table(name).queryExecution.optimizedPlan.stats

  /** S5: INSERT..SELECT append. */
  def append(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** S4: empty-schema clone (`CREATE TABLE x AS SELECT * FROM y WITH NO DATA`,
    * `Iteration 1/Group No.6_ELT.sql:30-40`). */
  def emptyLike(spark: SparkSession, df: DataFrame): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], df.schema)

  /** Schema-evolution read (r11): an ingestion directory whose parquet
    * files were written under DIFFERENT schema versions (columns added
    * over time) reads as one frame — file footers merge into the union
    * schema and files lacking a column null-fill it. Footer merging is a
    * distributed job over every file's metadata, fine for drop
    * directories; once the unified schema is known (catalog), prefer
    * [[readAs]] — identical null-fill semantics with ZERO footer scan,
    * the 100 TB path. */
  def readEvolved(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** The explicit-schema form of [[readEvolved]]: columns a file lacks
    * null-fill against the supplied schema without reading any footer. */
  def readAs(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType, path: String): DataFrame =
    spark.read.schema(schema).parquet(path)
}
