package graft.sources

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryRegistry}
import graft.oracle.OracleSql.{q => oq}

/** Small-file compaction: the table-maintenance operator every long-lived
  * 100 TB table needs (streaming appends, per-batch upserts and partitioned
  * loads all degrade into thousands of under-sized files whose per-file open
  * cost eventually dominates scans — the reference's `VACUUM` maintenance
  * analog, re-expressed for immutable parquet layouts as rewrite-and-swap).
  *
  * Split deliberately in two:
  *  - [[planCompaction]] is a PURE function over a file catalog
  *    `(part, file_id, bytes)` — deterministic, engine-independent, and
  *    oracle-checked against DuckDB on a data-derived catalog
  *    (`sink_compaction_plan`);
  *  - [[compactDir]] applies a plan to real files. The driver iterates
  *    BINS (a metadata-sized set, like Delta's OPTIMIZE job enumeration);
  *    executors move all data bytes.
  *
  * Scale: the plan input is one row per FILE — at 100 TB with 128 MB files
  * that is under a million rows, a metadata frame. Planning itself is one
  * shuffle on `part` (the window), output bins are ~`targetBytes` each, and
  * rewriting N bins is N independent column-preserving jobs that never
  * touch the already-right-sized files.
  */
object Compaction extends QueryRegistry {

  /** Size-tiered compaction plan. Files already at or above `targetBytes`
    * keep as-is (`compact = false`, `bin` null); smaller files pack into
    * bins by running cumulative size in deterministic `file_id` order:
    * `bin = cum_bytes_before div target`. Every small file lands in exactly
    * one bin, bins close at ~`targetBytes`, and the assignment is a single
    * window over the catalog — no driver loop, no sort beyond the
    * per-partition window order. */
  def planCompaction(files: DataFrame, targetBytes: Long): DataFrame = {
    val w = Window.partitionBy("part").orderBy("file_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val small = files.filter(col("bytes") < targetBytes)
      .withColumn("cum_before", coalesce(sum("bytes").over(w), lit(0L)))
      // integral div on both engines (a double floor() would round-trip
      // through FP and DuckDB's CAST rounds-to-nearest — same trap as the
      // r9 sampling-rate fix)
      .select(col("part"), col("file_id"), col("bytes"),
        lit(true).as("compact"),
        expr(s"cum_before div ${targetBytes}L").as("bin"))
    val big = files.filter(col("bytes") >= targetBytes)
      .select(col("part"), col("file_id"), col("bytes"),
        lit(false).as("compact"), lit(null).cast("long").as("bin"))
    small.unionByName(big)
  }

  /** Catalog of the actual parquet data files under `dir`, one row per
    * file: (part = dir-relative parent path or ".", file_id = file name,
    * bytes = length). Driver-side listing — the same metadata pass every
    * file-source scan already performs. */
  def listFiles(spark: SparkSession, dir: String): DataFrame = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val rootQ = fs.makeQualified(root).toString
    val it = fs.listFiles(fs.makeQualified(root), true)
    val rows = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet")) {
        val rel = st.getPath.getParent.toString.stripPrefix(rootQ).stripPrefix("/")
        rows += (((if (rel.isEmpty) "." else rel), st.getPath.getName, st.getLen))
      }
    }
    spark.createDataFrame(rows.toSeq).toDF("part", "file_id", "bytes")
  }

  /** Compact `dir` into `outDir` under a size-tiered plan: each bin's files
    * are read together and rewritten as one file; keep-as-is files are
    * byte-copied unchanged (no decode/re-encode cost for data that is
    * already right-sized). Returns the executed plan. */
  /** Run `op(part, group)` CONCURRENTLY per partition directory on a
    * bounded pool, sequentially within a part. Concurrency is per PART
    * dir, not per job: two Spark jobs committing into the same output
    * directory would fight over the shared `_temporary` staging dir,
    * while distinct directories give each committer its own. A sequential
    * loop was the r13 driver-side scale bug — thousands of tiny jobs in
    * series. Spark supports multi-threaded job submission; the first
    * failure propagates. */
  private[sources] def perPartConcurrently[A](byPart: Seq[(String, A)])
      (op: (String, A) => Unit): Unit = {
    if (byPart.isEmpty) return
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(8, byPart.size))
    try byPart.map { case (part, group) =>
      pool.submit(new Runnable { override def run(): Unit = op(part, group) })
    }.foreach(_.get())
    finally pool.shutdown()
  }

  /** Apply a compaction plan's rewrite half: every `compact=true` row's
    * file joins its bin, each bin re-encodes as ONE output file
    * (`coalesce(1)` append into its partition's output directory),
    * per-part concurrent via [[perPartConcurrently]]. Shared by the raw
    * directory path ([[compactDir]]) and the versioned-table verb
    * ([[VersionedTable.compact]]), which differ only in path mapping. */
  private[sources] def rewriteBins(spark: SparkSession,
      rows: Array[org.apache.spark.sql.Row],
      inPath: (String, String) => String, outPart: String => String,
      fileSchema: Option[org.apache.spark.sql.types.StructType]): Unit =
    perPartConcurrently(rows.filter(_.getAs[Boolean]("compact"))
        .groupBy(_.getAs[String]("part")).toSeq.sortBy(_._1)) { (part, ofPart) =>
      ofPart.groupBy(_.getAs[Long]("bin")).toSeq.sortBy(_._1).foreach {
        case (_, binFiles) =>
          // fresh reader per task: DataFrameReader is mutable state
          fileSchema.map(spark.read.schema(_)).getOrElse(spark.read)
            .parquet(binFiles.map(r =>
              inPath(part, r.getAs[String]("file_id"))).toSeq: _*)
            .coalesce(1).write.mode("append").parquet(outPart(part))
      }
    }

  def compactDir(spark: SparkSession, dir: String, outDir: String,
      targetBytes: Long,
      fileSchema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val plan = planCompaction(listFiles(spark, dir), targetBytes)
    val rows = plan.collect() // one row per file: metadata-sized
    def inPath(part: String, name: String) =
      if (part == ".") s"$dir/$name" else s"$dir/$part/$name"
    def outPart(part: String) = if (part == ".") outDir else s"$outDir/$part"
    rewriteBins(spark, rows, inPath, outPart, fileSchema)
    val conf = spark.sessionState.newHadoopConf()
    val hfs = new Path(dir).getFileSystem(conf)
    rows.filterNot(_.getAs[Boolean]("compact")).foreach { r =>
      val part = r.getAs[String]("part")
      val src = new Path(inPath(part, r.getAs[String]("file_id")))
      val dstDir = new Path(outPart(part))
      hfs.mkdirs(dstDir)
      FileUtil.copy(hfs, src, hfs, new Path(dstDir, src.getName), false, conf)
    }
    plan
  }

  // Oracle catalog: each document is a small object to pack (part = source,
  // bytes = n_chars) — the per-object sizes are scale-free, so a fixed
  // 400-byte target exercises BOTH branches (≈30% of docs are ≥400 chars)
  // at every sf.
  private val OracleTarget = 400L

  def defs: Seq[QueryDef] = Seq(
    QueryDef("sink_compaction_plan", (s, d) => planCompaction(
      graft.llm.TextOps.docs(s, d).select(
        col("source").as("part"), col("doc_id").as("file_id"),
        col("n_chars").as("bytes")),
      OracleTarget), Some(oq(s"""
      , cat AS (SELECT source AS part, doc_id AS file_id, n_chars AS bytes
                FROM documents),
      csmall AS (
        SELECT part, file_id, bytes,
               CAST(coalesce(sum(bytes) OVER (PARTITION BY part ORDER BY file_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
        FROM cat WHERE bytes < $OracleTarget)
      SELECT part, file_id, bytes, TRUE AS compact,
             cum_before // $OracleTarget AS bin
      FROM csmall
      UNION ALL
      SELECT part, file_id, bytes, FALSE AS compact, CAST(NULL AS BIGINT) AS bin
      FROM cat WHERE bytes >= $OracleTarget""")))
  )
}
