package graft.sources

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Targeted row deletion over an immutable parquet layout — the
  * right-to-be-forgotten / retention-purge operator (`DELETE WHERE` in a
  * table format): rows matching the predicate disappear, everything else
  * survives byte-for-byte.
  *
  * The 100 TB shape is FILE-SELECTIVE copy-on-write:
  *  1. ONE distributed probe scan finds the files that actually contain
  *     matching rows (`input_file_name()` + distinct — the predicate
  *     pushes to the scan, so the probe reads only the predicate columns
  *     and row-group stats skip clean files);
  *  2. only the affected files pay decode → filter → re-encode;
  *  3. untouched files are byte-copied unchanged into the new layout
  *     (with a manifest-based table format even the copy disappears — the
  *     new snapshot just references the old files; on a raw filesystem the
  *     copy IS the snapshot isolation, same discipline as
  *     [[Compaction.compactDir]]).
  * Deletion follows SQL `DELETE WHERE` semantics: rows where the predicate
  * is TRUE are removed; FALSE and NULL rows are kept.
  */
object Dml {

  /** Root-level reader for a layout: under an explicit `tableSchema` (a
    * schema-evolved table whose older files lack the added columns — see
    * [[VersionedTable.evolve]]) every file null-fills its missing columns;
    * otherwise the plain footer-schema read. */
  private def readRoot(spark: SparkSession, dir: String,
      tableSchema: Option[org.apache.spark.sql.types.StructType]): DataFrame =
    tableSchema.map(spark.read.schema(_)).getOrElse(spark.read).parquet(dir)

  /** The hit-file rewrite as ONE Spark job (r13): all affected files read
    * together with `basePath` (partition values ride in from the directory
    * names), `transform` applied, and the result written with dynamic
    * `partitionBy` so every row lands back in the directory its partition
    * values name. The earlier shape — one sequential job per affected
    * partition directory — was a driver-side loop that at lakehouse scale
    * (thousands of partitions touched by one DELETE) becomes thousands of
    * sequential tiny jobs; this is the same work as one distributed write.
    * Directory-name spelling is canonicalized for rewritten partitions
    * (identical to what any Spark/table-format writer produces — values,
    * escaping and the NULL partition round-trip exactly; only non-canonical
    * spellings like a zero-padded numeral are normalized, which the
    * root-level reads already did when inferring the column). */
  private def rewriteHits(spark: SparkSession, dir: String, outDir: String,
      hit: Seq[(String, String)],
      tableSchema: Option[org.apache.spark.sql.types.StructType])(
      transform: DataFrame => DataFrame): Unit = {
    if (hit.isEmpty) return
    val paths = hit.map { case (p, n) =>
      if (p == ".") s"$dir/$n" else s"$dir/$p/$n" }
    val partCols = hit.map(_._1).find(_ != ".").toSeq
      .flatMap(_.split("/").map(_.split("=", 2)(0)).toSeq)
    // always read under the ROOT-level schema: partition-type inference over
    // only the hit subset could disagree with the whole layout's (e.g. an
    // all-numeric subset of a string-typed bucket column)
    val schema = tableSchema.getOrElse(spark.read.parquet(dir).schema)
    val src = spark.read.schema(schema)
      .option("basePath", dir).parquet(paths: _*)
    val w = transform(src).write.mode("append")
    (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w).parquet(outDir)
  }

  /** Apply `DELETE WHERE pred` to the layout at `dir`, writing the
    * surviving layout to `outDir` (partition directory structure
    * preserved). `pred` must reference DATA columns only: a delete keyed
    * on a partition column is a directory drop, not a row rewrite — a
    * different (and trivial) operation this one does not fold in.
    * Returns the per-file decision frame `(part, file_id, rewritten)` —
    * metadata-sized, one row per file. */
  def deleteWhere(spark: SparkSession, dir: String, outDir: String,
      pred: Column,
      tableSchema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    import spark.implicits._
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val rootAbs = fs.makeQualified(root).toUri.getPath

    // probe: which files contain at least one matching row (URI → path
    // relative to the layout root, so it keys the catalog exactly)
    val affectedRel = readRoot(spark, dir, tableSchema).filter(pred)
      .select(input_file_name().as("f")).distinct()
      .collect()
      .map(r => new Path(new java.net.URI(r.getString(0))).toUri.getPath)
      .map(_.stripPrefix(rootAbs).stripPrefix("/"))
      .toSet

    def relOf(part: String, name: String) =
      if (part == ".") name else s"$part/$name"
    def inPath(part: String, name: String) =
      if (part == ".") s"$dir/$name" else s"$dir/$part/$name"
    def outPart(part: String) = if (part == ".") outDir else s"$outDir/$part"

    val files = Compaction.listFiles(spark, dir).collect()
      .map(r => (r.getAs[String]("part"), r.getAs[String]("file_id")))
    val (hit, clean) = files.partition { case (p, n) => affectedRel(relOf(p, n)) }

    // rewrite ONLY the affected files — one job, keeping rows where the
    // predicate is not TRUE (SQL DELETE semantics)
    rewriteHits(spark, dir, outDir, hit.toSeq, tableSchema)(
      _.filter(!coalesce(pred, lit(false))))
    // clean files carry no matching rows: byte-copy, no decode/re-encode
    clean.foreach { case (part, name) =>
      val src = new Path(inPath(part, name))
      val dstDir = new Path(outPart(part))
      fs.mkdirs(dstDir)
      FileUtil.copy(fs, src, fs, new Path(dstDir, name), false, conf)
    }
    (hit.map { case (p, n) => (p, n, true) } ++
      clean.map { case (p, n) => (p, n, false) })
      .toSeq.toDF("part", "file_id", "rewritten")
  }

  /** File-selective `UPDATE … SET … WHERE` (r12) — the remaining classic
    * DML verb beside [[deleteWhere]] / [[mergeInto]] / [[deleteKeys]]: rows
    * where `pred` is TRUE get the `assignments` applied, FALSE/NULL rows
    * survive byte-for-byte (and so do all clean files — same copy-on-write
    * shape: one pushed-predicate probe scan finds the affected files, only
    * those pay decode → conditional projection → re-encode). Standard SQL
    * UPDATE semantics: every assignment expression sees the OLD row values
    * (all are evaluated in one projection from the original columns, so
    * `SET a = b, b = a` swaps). Assignments cast back to each column's
    * original type — the layout's schema can never fork. Returns the
    * per-file `(part, file_id, rewritten)` decision frame. */
  def updateWhere(spark: SparkSession, dir: String, outDir: String,
      pred: Column, assignments: Map[String, Column],
      tableSchema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    import spark.implicits._
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val rootAbs = fs.makeQualified(root).toUri.getPath

    val schema = tableSchema.getOrElse(spark.read.parquet(dir).schema)
    val unknown = assignments.keySet.filterNot(schema.fieldNames.contains)
    require(unknown.isEmpty, s"UPDATE assigns unknown columns: ${unknown.mkString(", ")}")
    // validate against the FILE-level schema up front (ADVICE r12): the
    // root-read schema includes the partition columns, so a partition-column
    // assignment passed the unknown-check and — with a no-match predicate —
    // silently succeeded as a plain copy. Partition columns live in the
    // directory names listFiles reports; assigning one is a row MOVE
    // ([[updateMove]] / the mergeInto route), so it fails loudly here
    // regardless of predicate selectivity.
    val files = Compaction.listFiles(spark, dir).collect()
      .map(r => (r.getAs[String]("part"), r.getAs[String]("file_id")))
    val partCols = files.map(_._1).filter(_ != ".")
      .flatMap(_.split("/")).map(_.split("=", 2)(0)).toSet
    val partitionAssigns = assignments.keySet.intersect(partCols)
    require(partitionAssigns.isEmpty,
      s"UPDATE cannot assign partition columns: ${partitionAssigns.mkString(", ")}")

    val affectedRel = readRoot(spark, dir, tableSchema).filter(pred)
      .select(input_file_name().as("f")).distinct()
      .collect()
      .map(r => new Path(new java.net.URI(r.getString(0))).toUri.getPath)
      .map(_.stripPrefix(rootAbs).stripPrefix("/"))
      .toSet

    def relOf(part: String, name: String) =
      if (part == ".") name else s"$part/$name"
    def inPath(part: String, name: String) =
      if (part == ".") s"$dir/$name" else s"$dir/$part/$name"
    def outPart(part: String) = if (part == ".") outDir else s"$outDir/$part"

    val (hit, clean) = files.partition { case (p, n) => affectedRel(relOf(p, n)) }

    rewriteHits(spark, dir, outDir, hit.toSeq, tableSchema) { src =>
      src.select(src.schema.fields.map { f =>
        assignments.get(f.name)
          .map(a => when(coalesce(pred, lit(false)), a.cast(f.dataType))
            .otherwise(col(f.name)).as(f.name))
          .getOrElse(col(f.name))
      }.toSeq: _*)
    }
    clean.foreach { case (part, name) =>
      val src = new Path(inPath(part, name))
      val dstDir = new Path(outPart(part))
      fs.mkdirs(dstDir)
      FileUtil.copy(fs, src, fs, new Path(dstDir, name), false, conf)
    }
    (hit.map { case (p, n) => (p, n, true) } ++
      clean.map { case (p, n) => (p, n, false) })
      .toSeq.toDF("part", "file_id", "rewritten")
  }

  /** Row-move UPDATE (r13, VERDICT r12 #6) — the supported path for the
    * partition-column assignment [[updateWhere]] rejects: an UPDATE whose
    * SET touches a partition column RELOCATES the row, so the operation is
    * a delete-from-source-partition + partition-routed insert, executed in
    * one decision frame:
    *  1. same pushed-predicate probe → only files holding movers are
    *     touched; clean files byte-copy;
    *  2. each hit file splits once: NON-matching rows survive into their
    *     original partition directory byte-equivalently; matching rows get
    *     ALL assignments applied (data and partition columns, every
    *     expression seeing the OLD row values) and are appended
    *     partition-routed — each lands in the directory its NEW partition
    *     values name (including "moves" that resolve to the same
    *     partition: they rewrite in place, still correct).
    * Partition values ride directory names, not file bytes, so the hit-file
    * read re-injects them from the path (hive-escaped, null marker
    * honored) before evaluating `pred`/assignments — a predicate over the
    * partition column itself is fine. Returns the `(part, file_id,
    * rewritten)` decision frame. */
  def updateMove(spark: SparkSession, dir: String, outDir: String,
      pred: Column, assignments: Map[String, Column],
      tableSchema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    import spark.implicits._
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val rootAbs = fs.makeQualified(root).toUri.getPath

    val schema = tableSchema.getOrElse(spark.read.parquet(dir).schema)
    val unknown = assignments.keySet.filterNot(schema.fieldNames.contains)
    require(unknown.isEmpty, s"UPDATE assigns unknown columns: ${unknown.mkString(", ")}")

    val files = Compaction.listFiles(spark, dir).collect()
      .map(r => (r.getAs[String]("part"), r.getAs[String]("file_id")))
    // partition column order from the directory layout itself (nested
    // dirs = nested partitionBy order) — the routed insert must reproduce it
    val partCols: Seq[String] = files.map(_._1).find(_ != ".").toSeq
      .flatMap(_.split("/").toSeq).map(_.split("=", 2)(0))
    require(partCols.nonEmpty,
      "updateMove needs a partitioned layout; use updateWhere otherwise")
    require(assignments.keySet.exists(partCols.contains),
      s"no partition column assigned (${partCols.mkString(", ")}); use updateWhere")

    val affectedRel = readRoot(spark, dir, tableSchema).filter(pred)
      .select(input_file_name().as("f")).distinct()
      .collect()
      .map(r => new Path(new java.net.URI(r.getString(0))).toUri.getPath)
      .map(_.stripPrefix(rootAbs).stripPrefix("/"))
      .toSet

    def relOf(part: String, name: String) =
      if (part == ".") name else s"$part/$name"
    def inPath(part: String, name: String) = s"$dir/${relOf(part, name)}"

    val (hit, clean) = files.partition { case (p, n) => affectedRel(relOf(p, n)) }

    // one job: the basePath read rides partition values in from the
    // directory names (hive-unescaped, NULL marker honored), the
    // conditional projection applies every assignment to movers only —
    // each expression seeing the OLD row values, casts pinning each
    // column's original type — and the dynamic partitionBy write routes
    // every row to the directory its (old or new) partition values name
    rewriteHits(spark, dir, outDir, hit.toSeq,
        tableSchema.orElse(Some(schema))) { src =>
      src.select(schema.fields.map { f =>
        assignments.get(f.name)
          .map(a => when(coalesce(pred, lit(false)), a.cast(f.dataType))
            .otherwise(col(f.name)).as(f.name))
          .getOrElse(col(f.name))
      }.toSeq: _*)
    }
    clean.foreach { case (part, name) =>
      val src = new Path(inPath(part, name))
      val dstDir = new Path(s"$outDir/$part")
      fs.mkdirs(dstDir)
      FileUtil.copy(fs, src, fs, new Path(dstDir, name), false, conf)
    }
    (hit.map { case (p, n) => (p, n, true) } ++
      clean.map { case (p, n) => (p, n, false) })
      .toSeq.toDF("part", "file_id", "rewritten")
  }


  /** File-selective MERGE INTO (whole-row upsert): target rows whose key
    * matches an `updates` row are REPLACED by it, unmatched update rows
    * are INSERTED — `WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN
    * INSERT *`. Same copy-on-write shape as [[deleteWhere]]:
    *  1. the probe is a LEFT SEMI join of the target against the distinct
    *     update keys (update sets are change-sized — they broadcast; the
    *     probe's `input_file_name` + distinct is metadata-sized);
    *  2. only files holding matched rows pay decode → anti-join →
    *     re-encode (their matched rows drop out);
    *  3. clean files byte-copy unchanged;
    *  4. ALL update rows land as new files (replacements + inserts in one
    *     append — matched old versions are already gone).
    * `updates` must carry the target's DATA schema; for a partitioned
    * layout pass its partition columns so update rows route to their
    * directories (an update may legitimately move a row across
    * partitions). */
  def mergeInto(spark: SparkSession, dir: String, outDir: String,
      updates: DataFrame, keys: Seq[String],
      partitionCols: Seq[String] = Nil,
      tableSchema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val decisions = dropKeyedRows(spark, dir, outDir,
      updates.select(keys.map(col): _*).distinct(), keys, tableSchema)
    // replacements + inserts in one append, partition-routed when asked
    val w0 = updates.write.mode("append")
    (if (partitionCols.nonEmpty) w0.partitionBy(partitionCols: _*) else w0)
      .parquet(outDir)
    decisions
  }

  /** One ordered `WHEN MATCHED` clause of [[mergeClauses]]. */
  sealed trait MergeClause { def cond: Column }
  /** `WHEN MATCHED [AND cond] THEN UPDATE SET …` — assignment expressions
    * see the OLD target row by plain column name and the matching source
    * row through [[Dml.src]]. */
  final case class WhenMatchedUpdate(cond: Column, set: Map[String, Column])
      extends MergeClause
  /** `WHEN MATCHED [AND cond] THEN DELETE`. */
  final case class WhenMatchedDelete(cond: Column) extends MergeClause

  /** A source column inside a matched clause's condition or assignment
    * (the `src.col` of SQL MERGE's aliased source). */
  def src(name: String): Column = col(s"__src_$name")

  /** Full conditional `MERGE INTO` (r13) — the SQL verb with ordered
    * clauses, beyond the replace-by-key upsert of [[mergeInto]]:
    * {{{
    *   MERGE INTO target USING source ON keys
    *   WHEN MATCHED [AND c1] THEN UPDATE SET … / DELETE   (ordered, first
    *   WHEN MATCHED [AND c2] THEN …                        true clause wins)
    *   WHEN NOT MATCHED [AND c] THEN INSERT
    *   WHEN NOT MATCHED BY SOURCE [AND c] THEN UPDATE SET … / DELETE
    * }}}
    * Semantics: a target row with a key match evaluates the matched
    * clauses IN ORDER against (target row, source row) — the first clause
    * whose condition holds applies (update projects its assignments, every
    * expression seeing OLD values; delete drops the row); no true clause
    * leaves the row untouched. Matched-clause conditions and update
    * expressions reference target columns by name and source columns via
    * [[src]]. A source row matching NO target key inserts when it passes
    * `notMatchedInsert` (plain source column names; `None` ignores
    * unmatched source rows). `notMatchedBySource` clauses (r15) apply — in
    * order, first true wins, independently of the matched list — to TARGET
    * rows whose key appears nowhere in the source (the "sync to desired
    * state" half of SQL:2023 / Delta MERGE); their conditions and update
    * expressions see only target columns. SQL's cardinality rule is
    * enforced: a source with duplicate keys fails loudly (one target row
    * must never match two source rows). NULL keys never match, as in SQL.
    *
    * Execution is the same file-selective copy-on-write as every verb
    * here: one semi-join probe finds the files holding matched keys, only
    * those pay decode → left-join(source) → clause fold → re-encode (ONE
    * job), clean files byte-copy, inserts append partition-routed. A MERGE
    * with `notMatchedBySource` clauses necessarily rewrites EVERY file
    * (any file can hold source-unmatched rows), so the probe is skipped —
    * the same touched-set widening a production format's merge pays.
    * Returns the `(part, file_id, rewritten)` decision frame. */
  def mergeClauses(spark: SparkSession, dir: String, outDir: String,
      source: DataFrame, keys: Seq[String], matched: Seq[MergeClause],
      notMatchedInsert: Option[Column] = None,
      partitionCols: Seq[String] = Nil,
      tableSchema: Option[org.apache.spark.sql.types.StructType] = None,
      notMatchedBySource: Seq[MergeClause] = Nil): DataFrame = {
    import spark.implicits._
    require(matched.nonEmpty || notMatchedInsert.nonEmpty ||
      notMatchedBySource.nonEmpty, "an empty MERGE")
    // SQL's cardinality rule applies to keys that can MATCH: NULL keys never
    // match a target row (the same function's documented contract), so two
    // NULL-key source rows are legitimate, non-conflicting insert candidates
    // — excluding them here instead of rejecting them as "duplicates"
    // (ADVICE r13)
    require(source.filter(keys.map(col(_).isNotNull).reduce(_ && _))
        .groupBy(keys.map(col): _*).count()
        .filter(col("count") > 1).isEmpty,
      "MERGE cardinality violation: source holds duplicate keys")
    val schema = tableSchema.getOrElse(spark.read.parquet(dir).schema)
    (matched ++ notMatchedBySource).collect { case u: WhenMatchedUpdate => u }
      .foreach { u =>
        val unknown = u.set.keySet.filterNot(schema.fieldNames.contains)
        require(unknown.isEmpty, s"UPDATE assigns unknown columns: ${unknown.mkString(", ")}")
      }

    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val rootAbs = fs.makeQualified(root).toUri.getPath
    // the match marker lives OUTSIDE the __src_ rename image (ADVICE r13:
    // the old __src__matched name collided with a source column named
    // `_matched`, whose rename the withColumn silently replaced — clause
    // conditions then read the constant instead of the source value); no
    // rename can produce this name, and a column already carrying it is
    // rejected loudly
    val marker = "__graft_matched"
    require(!source.columns.contains(marker) && !schema.fieldNames.contains(marker),
      s"MERGE reserves the $marker column name")
    val srcRenamed = source.select(source.columns.map(c => col(c).as(s"__src_$c")).toSeq: _*)
      .withColumn(marker, lit(true))
    val keyCond = keys.map(k => col(k) === col(s"__src_$k")).reduce(_ && _)

    def relOf(part: String, name: String) =
      if (part == ".") name else s"$part/$name"
    def inPath(part: String, name: String) =
      if (part == ".") s"$dir/$name" else s"$dir/$part/$name"
    def outPart(part: String) = if (part == ".") outDir else s"$outDir/$part"
    val files = Compaction.listFiles(spark, dir).collect()
      .map(r => (r.getAs[String]("part"), r.getAs[String]("file_id")))
    // with NOT MATCHED BY SOURCE clauses every file can hold affected
    // (source-unmatched) rows, so all files rewrite and the probe job is
    // pure overhead; otherwise probe for files holding at least one
    // matched key and byte-copy the rest
    val (hit, clean) =
      if (notMatchedBySource.nonEmpty) (files, Array.empty[(String, String)])
      else {
        val affectedRel = readRoot(spark, dir, tableSchema)
          .withColumn("_probe_file", input_file_name())
          .join(source.select(keys.map(col): _*).distinct(), keys, "left_semi")
          .select(col("_probe_file").as("f")).distinct()
          .collect()
          .map(r => new Path(new java.net.URI(r.getString(0))).toUri.getPath)
          .map(_.stripPrefix(rootAbs).stripPrefix("/"))
          .toSet
        files.partition { case (p, n) => affectedRel(relOf(p, n)) }
      }

    // one ordered clause list: matched clauses fire on key-matched rows,
    // not-matched-by-source clauses on the rest — disjoint populations, so
    // a single first-true-clause fold serves both
    val allClauses: Seq[(MergeClause, Boolean)] =
      matched.map((_, true)) ++ notMatchedBySource.map((_, false))
    rewriteHits(spark, dir, outDir, hit.toSeq, tableSchema.orElse(Some(schema))) { tgt =>
      val joined = tgt.join(srcRenamed, keyCond, "left_outer")
      val isMatched = col(marker).isNotNull
      // first-true-clause index: 0 = no clause applies (row survives as-is)
      val clauseIdx = allClauses.zipWithIndex.foldRight(lit(0)) {
        case (((c, onMatched), i), rest) =>
          when((if (onMatched) isMatched else !isMatched) &&
            coalesce(c.cond, lit(false)), lit(i + 1)).otherwise(rest)
      }
      val deleteIdxs = allClauses.zipWithIndex.collect {
        case ((_: WhenMatchedDelete, _), i) => i + 1 }
      val kept =
        if (deleteIdxs.isEmpty) joined.withColumn("__clause", clauseIdx)
        else joined.withColumn("__clause", clauseIdx)
          .filter(!col("__clause").isin(deleteIdxs.map(Integer.valueOf): _*))
      kept.select(schema.fields.map { f =>
        allClauses.zipWithIndex.foldRight(col(f.name)) {
          case (((u: WhenMatchedUpdate, _), i), rest) if u.set.contains(f.name) =>
            when(col("__clause") === (i + 1), u.set(f.name).cast(f.dataType))
              .otherwise(rest)
          case (_, rest) => rest
        }.as(f.name)
      }.toSeq: _*)
    }
    clean.foreach { case (part, name) =>
      val s = new Path(inPath(part, name))
      val dstDir = new Path(outPart(part))
      fs.mkdirs(dstDir)
      FileUtil.copy(fs, s, fs, new Path(dstDir, name), false, conf)
    }
    // WHEN NOT MATCHED: source rows whose key exists nowhere in the target
    notMatchedInsert.foreach { insCond =>
      val inserts = source
        .join(readRoot(spark, dir, tableSchema).select(keys.map(col): _*).distinct(),
          keys, "left_anti")
        .filter(insCond)
        .select(schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
      val w = inserts.write.mode("append")
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .parquet(outDir)
    }
    (hit.map { case (p, n) => (p, n, true) } ++
      clean.map { case (p, n) => (p, n, false) })
      .toSeq.toDF("part", "file_id", "rewritten")
  }

  /** Tombstone-keyed DELETE (r11) — the right-to-be-forgotten purge as it
    * actually arrives: a KEY LIST (erasure requests), not a value
    * predicate. [[deleteWhere]]'s predicate form cannot express a large key
    * set (an `IN` literal caps out; a predicate cannot join), so the probe
    * here is the semi-join [[mergeInto]] already uses, and the rewrite an
    * anti-join. Key comparison is join equality: a NULL key row never
    * matches a tombstone and SURVIVES (the sane erasure contract — SQL
    * `NOT IN` would nuke the whole table on one NULL tombstone). The
    * tombstone set broadcasts while change-sized; past that it shuffle-
    * joins and every other part of the shape is unchanged. Returns the
    * per-file `(part, file_id, rewritten)` decision frame. */
  def deleteKeys(spark: SparkSession, dir: String, outDir: String,
      tombstones: DataFrame, keys: Seq[String],
      tableSchema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame =
    dropKeyedRows(spark, dir, outDir,
      tombstones.select(keys.map(col): _*).distinct(), keys, tableSchema)

  /** The shared copy-on-write kernel of [[mergeInto]] and [[deleteKeys]]:
    * drop every row whose key appears in `keySet` (pre-deduplicated), file-
    * selectively — semi-join probe finds affected files, only those pay
    * decode → anti-join → re-encode, clean files byte-copy. */
  private def dropKeyedRows(spark: SparkSession, dir: String, outDir: String,
      keySet: DataFrame, keys: Seq[String],
      tableSchema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    import spark.implicits._
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val rootAbs = fs.makeQualified(root).toUri.getPath

    // file name is tagged BEFORE the join: input_file_name() is only
    // defined against a single source, and the tag pins it to the scan
    val affectedRel = readRoot(spark, dir, tableSchema)
      .withColumn("_probe_file", input_file_name())
      .join(keySet, keys, "left_semi")
      .select(col("_probe_file").as("f")).distinct()
      .collect()
      .map(r => new Path(new java.net.URI(r.getString(0))).toUri.getPath)
      .map(_.stripPrefix(rootAbs).stripPrefix("/"))
      .toSet

    def relOf(part: String, name: String) =
      if (part == ".") name else s"$part/$name"
    def inPath(part: String, name: String) =
      if (part == ".") s"$dir/$name" else s"$dir/$part/$name"
    def outPart(part: String) = if (part == ".") outDir else s"$outDir/$part"

    val files = Compaction.listFiles(spark, dir).collect()
      .map(r => (r.getAs[String]("part"), r.getAs[String]("file_id")))
    val (hit, clean) = files.partition { case (p, n) => affectedRel(relOf(p, n)) }

    rewriteHits(spark, dir, outDir, hit.toSeq, tableSchema)(
      _.join(keySet, keys, "left_anti"))
    clean.foreach { case (part, name) =>
      val src = new Path(inPath(part, name))
      val dstDir = new Path(outPart(part))
      fs.mkdirs(dstDir)
      FileUtil.copy(fs, src, fs, new Path(dstDir, name), false, conf)
    }

    (hit.map { case (p, n) => (p, n, true) } ++
      clean.map { case (p, n) => (p, n, false) })
      .toSeq.toDF("part", "file_id", "rewritten")
  }
}
