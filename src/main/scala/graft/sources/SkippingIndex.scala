package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level data-skipping index — the stats table behind [[ZOrder]].
  *
  * Open-source Spark prunes parquet at two layers: partition directories at
  * planning, row groups inside each file at read time. What it lacks is the
  * lakehouse middle layer (Delta/Iceberg manifests): a per-FILE min/max
  * stats table consulted at planning so non-matching files never even open.
  * At 100 TB that layer is the difference between "every task opens a
  * footer" and "the driver plans 40 of 80 000 files" — footer opens are
  * cheap individually but at fleet scale they are a full S3 LIST + GET
  * storm per query.
  *
  * [[build]] computes the stats table with one columnar scan over only the
  * indexed columns (at layout-build time, amortized over every later
  * query); [[prunedRead]] consults it like a manifest: the surviving file
  * list is collected driver-side — the same driver-resident file-index
  * shape every planner (and every table format's manifest read) already
  * has — and handed to the reader, with the exact predicate kept on top to
  * clear sub-file granularity.
  *
  * Pruning is sound for conjunctive range/point predicates on the indexed
  * columns: a file is skipped only when its [min, max] cannot contain a
  * matching row (all-null files for the column are kept — min/max are
  * null-ignoring, so a null-only file has null stats and survives the
  * overlap test's null-safe form).
  */
object SkippingIndex {

  /** Per-file stats for `cols` over a parquet layout: row count plus
    * null-ignoring min/max per column (`<c>_min` / `<c>_max`). One
    * pushdown-pruned scan reading only `cols`. */
  def build(spark: SparkSession, path: String, cols: Seq[String]): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"),
        cols.flatMap(c => Seq(
          min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))): _*)

  /** Incremental index maintenance — the manifest-refresh operation a
    * growing layout needs: stats are computed ONLY for files the index has
    * not seen (an append's marginal cost is its own files, never a rescan),
    * and rows for files no longer on disk (compacted/vacuumed away) drop
    * out. File listings are driver-resident metadata on both sides — the
    * same shape every planner's file index already holds; no data is read
    * for unchanged files. */
  def refresh(spark: SparkSession, path: String, index: DataFrame,
      cols: Seq[String]): DataFrame = {
    import spark.implicits._
    // a refresh is called precisely because files changed OUT OF BAND
    // (append/compaction/vacuum by another writer): invalidate Spark's
    // cached listings/footers for the path first, else the session can
    // keep serving vanished files (observed: a stale read returned a
    // deleted file's rows)
    spark.catalog.refreshByPath(path)
    val current = spark.read.parquet(path).inputFiles.toSet // listing only, no job
    val known = index.select("file").collect().map(_.getString(0)).toSet
    val added = (current -- known).toSeq.sorted
    val kept = index.join(
      current.intersect(known).toSeq.toDF("file"), Seq("file"), "left_semi")
    if (added.isEmpty) kept
    else {
      val schema = spark.read.parquet(path).schema
      val addedStats = spark.read.schema(schema).parquet(added: _*)
        .groupBy(input_file_name().as("file"))
        .agg(count(lit(1)).as("n_rows"),
          cols.flatMap(c => Seq(
            min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))): _*)
      kept.unionByName(addedStats)
    }
  }

  /** An inclusive box predicate on an indexed column. */
  final case class Box(column: String, lo: Any, hi: Any)

  /** The stats-overlap predicate for a conjunction of boxes: a row (file)
    * is admitted when every box's range can contain a matching value.
    * Null-safe: a file with null stats (all-null column) is kept — skipping
    * is only ever justified by positive evidence. Shared with
    * [[VersionedStats]], whose stats tables carry the same `<c>_min` /
    * `<c>_max` shape. */
  private[sources] def admitsAll(boxes: Seq[Box]): Column =
    boxes.map { b =>
      val (mn, mx) = (col(s"${b.column}_min"), col(s"${b.column}_max"))
      (mn <= lit(b.hi) && mx >= lit(b.lo)) || mn.isNull
    }.reduce(_ && _)

  /** Files whose stats admit a row matching EVERY box (conjunction). */
  def survivingFiles(index: DataFrame, boxes: Seq[Box]): Seq[String] =
    index.filter(admitsAll(boxes)).select("file")
      .collect().map(_.getString(0)).toSeq

  /** Manifest-style read: only files the index admits are opened; `boxes`
    * is re-applied exactly on top (file-level stats are necessary, not
    * sufficient). Returns an empty frame with the layout's schema when
    * nothing survives. */
  def prunedRead(spark: SparkSession, path: String, index: DataFrame,
                 boxes: Seq[Box]): DataFrame = {
    val exact = boxes.map(b => col(b.column) >= lit(b.lo) && col(b.column) <= lit(b.hi))
      .reduceOption(_ && _).getOrElse(lit(true))
    val files = survivingFiles(index, boxes)
    val all = spark.read.parquet(path)
    if (files.isEmpty) all.filter(lit(false))
    else spark.read.schema(all.schema).parquet(files: _*).filter(exact)
  }
}
