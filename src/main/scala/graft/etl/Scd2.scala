package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryRegistry}
import graft.oracle.OracleSql.{q => oq}

/** Type-2 slowly-changing-dimension maintenance (beyond parity — the
  * reference keeps current-state dims only, with keep-latest dedup:
  * `Iteration 1/Group No.6_ETL.sql:96-118`; a production warehouse also
  * needs the VERSIONED history those dims discard).
  *
  * A history table carries the dimension's key + tracked attributes plus
  * `valid_from`/`valid_to` (open versions have `valid_to IS NULL`). Folding
  * a new snapshot in:
  *   - new key                     → open a version at `asOf`
  *   - tracked attribute changed   → close the open version at `asOf`, open
  *                                   a new one carrying the new attributes
  *   - unchanged                   → untouched
  *   - key absent from snapshot    → close the open version (a dimension
  *                                   delete; `closeDeletes = false` keeps it)
  *   - already-closed versions     → pass through untouched, never rejoined
  *
  * Scale shape: ONE equi-join of open versions against the snapshot on the
  * key (both dim-sized; broadcast under AQE when the snapshot is small),
  * then a single pass emitting 0-2 versions per joined row via explode —
  * not a two-projection union, which would plan the join twice (measured:
  * exchange reuse does not materialize across union branches). Closed
  * history never enters the join: the operator's cost is the CURRENT
  * dimension's size regardless of how deep the history grows. Attribute
  * comparison is null-safe (`<=>`). */
object Scd2 extends QueryRegistry {

  private def tsLit(ts: String): Column =
    lit(ts).cast("timestamp_ntz")

  private def nullTs: Column = lit(null).cast("timestamp_ntz")

  /** First load: every snapshot row becomes an open version at `asOf`. */
  def initialLoad(snapshot: DataFrame, asOf: String): DataFrame =
    snapshot
      .withColumn("valid_from", tsLit(asOf))
      .withColumn("valid_to", nullTs)

  /** Fold `snapshot` (the dimension's state at `asOf`) into `history`. */
  def merge(history: DataFrame, snapshot: DataFrame, keys: Seq[String],
      attrs: Seq[String], asOf: String, closeDeletes: Boolean = true): DataFrame = {
    val outCols = (keys ++ attrs :+ "valid_from" :+ "valid_to").map(col)
    val closed = history.filter(col("valid_to").isNotNull).select(outCols: _*)
    closed.unionByName(foldEmitted(history.filter(col("valid_to").isNull),
      snapshot, keys, attrs, asOf, closeDeletes))
  }

  /** The single-fold kernel shared by [[merge]] and the segmented store:
    * folds `snapshot` against the OPEN version set only and returns every
    * version the fold touches — kept-open, closed-at-asOf, and newly
    * opened. Previously-closed history never enters (the caller owns it),
    * which is exactly what makes the append-only segment layout's per-drop
    * cost O(current dim). */
  private def foldEmitted(current: DataFrame, snapshot: DataFrame,
      keys: Seq[String], attrs: Seq[String], asOf: String,
      closeDeletes: Boolean): DataFrame = {
    // prefix-rename both sides so the full-outer join is unambiguous
    val c = current.select(
      keys.map(k => col(k).as(s"k_$k")) ++
        attrs.map(a => col(a).as(s"c_$a")) :+
        col("valid_from").as("c_valid_from"): _*)
    val s = snapshot.select(
      keys.map(k => col(k).as(s"k_$k")) ++
        attrs.map(a => col(a).as(s"s_$a")) :+
        lit(true).as("s_mark"): _*)
    val j = c.join(s, keys.map(k => s"k_$k"), "full_outer")

    val cExists = col("c_valid_from").isNotNull // valid_from is never null
    val sExists = col("s_mark").isNotNull
    val changed = attrs.map(a => !(col(s"c_$a") <=> col(s"s_$a"))).reduce(_ || _)

    // each joined row emits 0-2 versions in ONE pass (a two-projection
    // union would plan the join twice — measured: no exchange reuse
    // materializes across union branches, so the single-join explode is the
    // shape that holds at scale):
    //  - the current version, kept open or closed at asOf
    //  - a new open version for new or changed keys
    val closeNow = sExists && changed || (!sExists && lit(closeDeletes))
    val currentVersion = struct(
      keys.map(k => col(s"k_$k").as(k)) ++
        attrs.map(a => col(s"c_$a").as(a)) :+
        col("c_valid_from").as("valid_from") :+
        when(closeNow, tsLit(asOf)).otherwise(nullTs).as("valid_to"): _*)
    val newVersion = struct(
      keys.map(k => col(s"k_$k").as(k)) ++
        attrs.map(a => col(s"s_$a").as(a)) :+
        tsLit(asOf).as("valid_from") :+
        nullTs.as("valid_to"): _*)
    val openNow = sExists && (!cExists || changed)
    j.select(explode(filter(array(
        when(cExists, currentVersion),
        when(openNow, newVersion)), x => x.isNotNull)).as("r"))
      .select((keys ++ attrs :+ "valid_from" :+ "valid_to").map(n => col(s"r.$n")): _*)
  }

  /** Point-in-time read: the dimension as it stood at `asOf`. */
  def asOfSnapshot(history: DataFrame, asOf: String): DataFrame =
    history.filter(col("valid_from") <= tsLit(asOf) &&
      (col("valid_to").isNull || col("valid_to") > tsLit(asOf)))

  /** Temporal fact→dimension lookup — the reason a warehouse keeps SCD2
    * history: each fact row joins the version valid AT ITS OWN TIME, not
    * today's. A version's intervals are DISJOINT per key by [[merge]]
    * construction, so this is not a general as-of problem: a plain LEFT
    * equi-join on the key with the interval residual
    * (`valid_from <= t AND (valid_to IS NULL OR valid_to > t)`) matches at
    * most one version per fact row. Under AQE the dim-sized history
    * broadcasts and the FACT IS NEVER SHUFFLED OR SORTED AT ALL — strictly
    * cheaper than the as-of window form (measured 0.35 s vs 1.16 s on the
    * 600k-fact row), which remains the right tool only when the right side
    * is itself fact-sized ([[graft.operators.AsOf]]).
    * Returns the fact columns + an `asof` struct of the live version's
    * attributes, `valid_to`, and `valid_from` (null when none was live). */
  def temporalLookup(fact: DataFrame, history: DataFrame, keys: Seq[String],
      timeCol: String): DataFrame = {
    // the AsOf-compatible payload order: attrs, valid_to, then valid_from
    val pFields = history.columns.toSeq
      .filterNot(c => keys.contains(c) || c == "valid_from") :+ "valid_from"
    val h = history.select(
      keys.map(k => col(k).as(s"_k_$k")) ++ pFields.map(c => col(c).as(s"_h_$c")): _*)
    val cond = keys.map(k => col(k) === col(s"_k_$k")).reduce(_ && _) &&
      col("_h_valid_from") <= col(timeCol) &&
      (col("_h_valid_to").isNull || col("_h_valid_to") > col(timeCol))
    fact.join(h, cond, "left")
      .withColumn("asof", when(col("_h_valid_from").isNotNull,
        struct(pFields.map(c => col(s"_h_$c").as(c)): _*)))
      .drop(keys.map(k => s"_k_$k") ++ pFields.map(c => s"_h_$c"): _*)
  }

  // ---------------------------------------------------------------------
  // Segmented history store (r11, VERDICT r10 #1b). The r10 store rewrote
  // the ENTIRE history parquet per snapshot drop — correct, but O(full
  // history) per drop at deep history. This layout makes the per-drop cost
  // O(current dim) and nothing else:
  //
  //   <root>/closed/seg_<fold>/   versions closed by fold <fold>; written
  //                               once, NEVER rewritten (append-only)
  //   <root>/open_<fold>/         the full open-version set after fold
  //                               <fold> (dim-sized; prior one deleted
  //                               after commit)
  //   <root>/_commit              tiny manifest: "<fold>\n<as_of>" — the
  //                               ONE mutable object; a fold exists only
  //                               once named here
  //
  // A fold runs ONE Spark job: [[foldEmitted]] over open_<i> + snapshot,
  // written partitioned by open/closed state, then two metadata renames
  // install the parts and the commit swap publishes them. Crash-safety: a
  // crash before the commit swap leaves _commit at fold i, so the reader
  // ignores any orphaned seg_/open_ dirs > i and the retried fold deletes
  // and rewrites them. Closed segments named ≤ the committed fold are
  // immutable forever (spec-pinned byte-stable), so history readers can
  // cache/index them incrementally, and cached file listings can never go
  // stale: every committed path is written exactly once.
  // ---------------------------------------------------------------------

  private def tsOf(asOf: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(asOf)

  /** The manifest is the AUTHORITY for which closed segments exist: `segs`
    * lists them by name, so compaction can retire many small segments for
    * one merged one with a single commit swap — any dir under `closed/`
    * not named here is debris of a crashed fold/compaction and is never
    * read. */
  private final case class Commit(fold: Int, asOf: String, segs: Seq[String])

  private def fsOf(spark: SparkSession, root: String) = {
    val p = new org.apache.hadoop.fs.Path(root)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  private def readCommit(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Option[Commit] = {
    val c = new org.apache.hadoop.fs.Path(root, "_commit")
    val tmp = new org.apache.hadoop.fs.Path(root, "_commit.tmp")
    // the swap window: tmp written, old commit deleted, rename pending —
    // roll the tmp forward so the committed fold is never lost
    if (!fs.exists(c) && fs.exists(tmp)) fs.rename(tmp, c)
    if (!fs.exists(c)) None
    else {
      val in = fs.open(c)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      txt.split("\n").toList match {
        case fold :: asOf :: rest =>
          val segs = rest.find(_.startsWith("segs:"))
            .map(_.stripPrefix("segs:").split(",").map(_.trim).filter(_.nonEmpty).toSeq)
            .getOrElse(Seq.empty)
          Some(Commit(fold.trim.toInt, asOf.trim, segs))
        case _ => throw new IllegalStateException(
          s"corrupt SCD2 commit manifest at $c: '$txt'")
      }
    }
  }

  private def writeCommit(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, commit: Commit): Unit = {
    val c = new org.apache.hadoop.fs.Path(root, "_commit")
    val tmp = new org.apache.hadoop.fs.Path(root, "_commit.tmp")
    val out = fs.create(tmp, true)
    try out.write(
      s"${commit.fold}\n${commit.asOf}\nsegs:${commit.segs.mkString(",")}\n"
        .getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(c)) fs.delete(c, false)
    fs.rename(tmp, c)
  }

  /** Fold one snapshot into the segmented store at `root` (creating it on
    * first use). Ordering contract (ADVICE r10): drops must arrive in
    * ascending `asOf` — a fold at the COMMITTED `asOf` is an at-least-once
    * replay of work already done and is skipped idempotently; a fold
    * strictly behind it would corrupt the interval history and fails
    * loudly. Returns true when the fold was applied, false when skipped. */
  def foldSnapshot(spark: SparkSession, snapshot: DataFrame, asOf: String,
      keys: Seq[String], attrs: Seq[String], root: String,
      closeDeletes: Boolean = true): Boolean = {
    val (fs, rootP) = fsOf(spark, root)
    fs.mkdirs(rootP)
    val committed = readCommit(fs, rootP)
    if (committed.exists(_.asOf == asOf)) return false // replayed committed fold
    committed.foreach { c =>
      if (!tsOf(asOf).after(tsOf(c.asOf))) throw new IllegalStateException(
        s"SCD2 store at $root is committed through as_of ${c.asOf}; " +
          s"folding $asOf would write versions with valid_to earlier than " +
          "valid_from — snapshot drops must arrive in ascending as_of order")
    }
    val next = committed.map(_.fold + 1).getOrElse(1)
    val tmp = new org.apache.hadoop.fs.Path(rootP, "_fold.tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)

    val snapCols = snapshot.select((keys ++ attrs).map(col): _*)
    val emitted = committed match {
      case None => initialLoad(snapCols, asOf)
      case Some(c) => foldEmitted(
        spark.read.parquet(s"$root/open_${c.fold}"),
        snapCols, keys, attrs, asOf, closeDeletes)
    }
    emitted
      .withColumn("_state", when(col("valid_to").isNull, "open").otherwise("closed"))
      .write.partitionBy("_state").parquet(tmp.toString)

    // install the parts: pure renames, no data rewrite. Dirs named `next`
    // can only be debris of a crashed uncommitted attempt — safe to drop.
    val closedPart = new org.apache.hadoop.fs.Path(tmp, "_state=closed")
    val newSeg = if (!fs.exists(closedPart)) None else {
      val segName = f"seg_$next%06d"
      val segDest = new org.apache.hadoop.fs.Path(rootP, s"closed/$segName")
      fs.mkdirs(new org.apache.hadoop.fs.Path(rootP, "closed"))
      if (fs.exists(segDest)) fs.delete(segDest, true)
      fs.rename(closedPart, segDest)
      Some(segName)
    }
    val openPart = new org.apache.hadoop.fs.Path(tmp, "_state=open")
    val openDest = new org.apache.hadoop.fs.Path(rootP, s"open_$next")
    if (fs.exists(openDest)) fs.delete(openDest, true)
    if (fs.exists(openPart)) fs.rename(openPart, openDest)
    else // every key closed (e.g. an empty snapshot): the open set is empty
      initialLoad(snapCols.limit(0), asOf).write.parquet(openDest.toString)

    writeCommit(fs, rootP,
      Commit(next, asOf, committed.map(_.segs).getOrElse(Seq.empty) ++ newSeg))
    // the previous open set is garbage now (its closed rows live in the
    // new segment, its still-open rows in open_<next>)
    committed.foreach(c =>
      fs.delete(new org.apache.hadoop.fs.Path(rootP, s"open_${c.fold}"), true))
    fs.delete(tmp, true)
    true
  }

  /** The full version history of a segmented store: the committed open set
    * plus exactly the closed segments the manifest names. Orphans of a
    * crashed fold or compaction are never read. */
  def readHistory(spark: SparkSession, root: String): DataFrame = {
    val (fs, rootP) = fsOf(spark, root)
    val c = readCommit(fs, rootP).getOrElse(throw new IllegalStateException(
      s"no committed SCD2 history at $root"))
    val open = spark.read.parquet(s"$root/open_${c.fold}")
    if (c.segs.isEmpty) open
    else open.unionByName(
      spark.read.parquet(c.segs.map(s => s"$root/closed/$s"): _*))
  }

  /** Closed-segment compaction — the maintenance op a DEEP history needs:
    * every fold that closes versions appends one (often small) immutable
    * segment, so after thousands of drops the closed set is thousands of
    * files. This merges all committed segments into ONE and retires the
    * originals with a single manifest swap (the manifest is the segment
    * authority, so the swap is the commit point): a crash before it leaves
    * the merged dir as ignored debris, a crash after it leaves the old
    * segments as garbage that the post-commit sweep (re-)collects next
    * time. Concurrent with NO fold — the store is single-writer by
    * contract (the streaming maintainer's foreachBatch). Byte-stability of
    * committed segments holds ACROSS FOLDS; compaction is the explicit op
    * that retires them. Returns true when a compaction was performed. */
  def compactSegments(spark: SparkSession, root: String): Boolean = {
    val (fs, rootP) = fsOf(spark, root)
    val c = readCommit(fs, rootP).getOrElse(throw new IllegalStateException(
      s"no committed SCD2 history at $root"))
    // sweep debris from any earlier crashed/committed compaction first, so
    // repeated calls converge to a clean layout even after failures
    val closedDir = new org.apache.hadoop.fs.Path(rootP, "closed")
    if (fs.exists(closedDir))
      fs.listStatus(closedDir).map(_.getPath)
        .filterNot(p => c.segs.contains(p.getName))
        .foreach(p => fs.delete(p, true))
    if (c.segs.size <= 1) return false
    val segName = f"cseg_${c.fold}%06d"
    val tmp = new org.apache.hadoop.fs.Path(rootP, "_compact.tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    spark.read.parquet(c.segs.map(s => s"$root/closed/$s"): _*)
      .write.parquet(tmp.toString)
    val dest = new org.apache.hadoop.fs.Path(rootP, s"closed/$segName")
    if (fs.exists(dest)) fs.delete(dest, true)
    fs.rename(tmp, dest)
    val old = c.segs
    writeCommit(fs, rootP, c.copy(segs = Seq(segName)))
    old.foreach(s =>
      fs.delete(new org.apache.hadoop.fs.Path(rootP, s"closed/$s"), true))
    true
  }

  /** Right-to-be-forgotten purge across the WHOLE version history (r12):
    * tombstoned keys disappear from the open set AND from every closed
    * segment — erasure is the one operation allowed to rewrite committed
    * history (the legal mandate overrides the append-only contract, which
    * otherwise holds). Segment-SELECTIVE: one semi-join probe over the
    * manifest's segments finds which actually hold a victim row
    * (`input_file_name` → segment dir, metadata-sized), only those are
    * rewritten (anti-join, under a purge name); untouched segments survive
    * byte-stable under their existing names. The open set rewrites to
    * `open_<fold+1>` and ONE manifest swap at `fold+1` with the SAME
    * committed `as_of` publishes everything — a purge is not a snapshot
    * drop, so replay-skip and ordering semantics of future folds are
    * unchanged. Crash before the swap leaves only debris the existing
    * sweeps ignore/collect; crash after leaves retired dirs the post-commit
    * sweep (re-)collects. NULL-keyed rows never match a tombstone and
    * survive, as in [[graft.sources.Dml.deleteKeys]]. Single-writer by
    * contract, like every store mutation. Returns the names of the
    * segments that were rewritten. */
  def purgeKeys(spark: SparkSession, root: String, tombstones: DataFrame,
      keys: Seq[String]): Seq[String] = {
    val (fs, rootP) = fsOf(spark, root)
    val c = readCommit(fs, rootP).getOrElse(throw new IllegalStateException(
      s"no committed SCD2 history at $root"))
    val next = c.fold + 1
    val keySet = tombstones.select(keys.map(col): _*).distinct().cache()
    try {
      // probe: which committed segments hold at least one victim version
      val affected: Set[String] =
        if (c.segs.isEmpty) Set.empty
        else spark.read.parquet(c.segs.map(s => s"$root/closed/$s"): _*)
          .withColumn("_probe_file", input_file_name())
          .join(keySet, keys, "left_semi")
          .select("_probe_file").distinct().collect()
          .map(r => new org.apache.hadoop.fs.Path(
            new java.net.URI(r.getString(0))).getParent.getName)
          .toSet
      val newSegs = c.segs.map { s =>
        if (!affected(s)) s
        else {
          val purged = f"pseg_$next%06d_$s"
          val tmp = new org.apache.hadoop.fs.Path(rootP, "_purge.tmp")
          if (fs.exists(tmp)) fs.delete(tmp, true)
          spark.read.parquet(s"$root/closed/$s")
            .join(keySet, keys, "left_anti")
            .write.parquet(tmp.toString)
          val dest = new org.apache.hadoop.fs.Path(rootP, s"closed/$purged")
          if (fs.exists(dest)) fs.delete(dest, true)
          fs.rename(tmp, dest)
          purged
        }
      }
      // the open set always rewrites to the next fold's directory
      val openTmp = new org.apache.hadoop.fs.Path(rootP, "_purge_open.tmp")
      if (fs.exists(openTmp)) fs.delete(openTmp, true)
      spark.read.parquet(s"$root/open_${c.fold}")
        .join(keySet, keys, "left_anti")
        .write.parquet(openTmp.toString)
      val openDest = new org.apache.hadoop.fs.Path(rootP, s"open_$next")
      if (fs.exists(openDest)) fs.delete(openDest, true)
      fs.rename(openTmp, openDest)
      // the commit point
      writeCommit(fs, rootP, Commit(next, c.asOf, newSegs))
      // post-commit sweep: retired segments + the pre-purge open set
      affected.foreach(s =>
        fs.delete(new org.apache.hadoop.fs.Path(rootP, s"closed/$s"), true))
      fs.delete(new org.apache.hadoop.fs.Path(rootP, s"open_${c.fold}"), true)
      c.segs.filter(affected).toList
    } finally { keySet.unpersist(); () }
  }

  /** Continuous dimension maintenance (the streaming face of
    * [[foldSnapshot]]): a drop directory of snapshot files, each row
    * stamped with its snapshot's effective timestamp in an `as_of` column —
    * the timestamp belongs IN the feed, not to arrival wall-clock, so
    * replays and multi-snapshot batches stay deterministic. Each
    * micro-batch folds its snapshots into the segmented store in ascending
    * `as_of` order (a batch may carry several drops; the per-`as_of` driver
    * loop is snapshot-count-sized). Crash/replay safety comes from the
    * store itself: a replayed batch's already-committed folds skip
    * idempotently, and per-drop cost is O(current dim) however deep the
    * closed history grows. `compactAtSegments` bounds the closed set's
    * file count in-stream: once the committed segment count reaches the
    * threshold, [[compactSegments]] runs between folds (the maintainer IS
    * the store's single writer, so the maintenance slot is here). Read the
    * result with [[readHistory]]. */
  def maintainHistory(spark: SparkSession, dropDir: String, keys: Seq[String],
      attrs: Seq[String], historyPath: String,
      maxFilesPerTrigger: Option[Int] = None,
      compactAtSegments: Option[Int] = None)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    // schema from a batch read of the already-present drops — the same
    // no-hard-coded-schema discipline as the events reader
    val reader = spark.readStream.schema(spark.read.parquet(dropDir).schema)
    maxFilesPerTrigger.fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(dropDir)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val asOfs = batch.select("as_of").distinct()
          .collect().map(_.getString(0)).sorted
        asOfs.foreach { asOf =>
          foldSnapshot(spark, batch.filter(col("as_of") === asOf).drop("as_of"),
            asOf, keys, attrs, historyPath)
          compactAtSegments.foreach { n =>
            val (fs, rootP) = fsOf(spark, historyPath)
            if (readCommit(fs, rootP).exists(_.segs.size >= n))
              compactSegments(spark, historyPath)
          }
        }
        ()
      }
  }

  /** The deterministic two-snapshot churn both oracle scenarios share:
    * v1 = the product dim (natural stockcode key — surrogate keys are
    * engine conventions, xxhash64 here vs row_number in the oracle, never
    * comparable); v2 = every 3rd stockcode's price +1.00 (exact decimal
    * addition — no rounding-boundary risk), every 17th deleted. */
  private def productSnapshots(w: Warehouse): (DataFrame, DataFrame) = {
    val code = col("stockcode").cast("long")
    val v1 = w.dimProduct.select("stockcode", "unitprice")
    val v2 = v1.filter(code % 17 =!= 0)
      .withColumn("unitprice",
        when(code % 3 === 0,
          (col("unitprice") + lit(BigDecimal("1.00"))).cast("decimal(12,2)"))
          .otherwise(col("unitprice")))
    (v1, v2)
  }

  /** Oracle scenario: the product dim initial-loaded at 2020-01-01, then
    * the churned snapshot merged at 2020-02-01 — exercising new, changed,
    * deleted, and unchanged keys from one data-derived source. */
  private def productScd2(spark: SparkSession, dir: String): DataFrame = {
    val (v1, v2) = productSnapshots(Warehouse(spark, dir))
    merge(initialLoad(v1, "2020-01-01 00:00:00"), v2,
      keys = Seq("stockcode"), attrs = Seq("unitprice"),
      asOf = "2020-02-01 00:00:00")
      .withColumn("unitprice", col("unitprice").cast("double"))
  }

  /** Streaming roundtrip: the SAME two snapshots delivered as `as_of`-
    * stamped drops through [[maintainHistory]] (one-file micro-batches, so
    * the second snapshot exercises a real fold against the committed
    * segmented store), read back — must equal the batch merge row-for-row,
    * so it shares `dim_product_scd2`'s oracle. */
  private def streamScd2Roundtrip(spark: SparkSession, dir: String): DataFrame = {
    val (v1, v2) = productSnapshots(Warehouse(spark, dir))
    val base = java.nio.file.Files.createTempDirectory("graft_scd2_stream_").toString
    v1.withColumn("as_of", lit("2020-01-01 00:00:00"))
      .coalesce(1).write.parquet(s"$base/drops/a")
    v2.withColumn("as_of", lit("2020-02-01 00:00:00"))
      .coalesce(1).write.parquet(s"$base/drops/b")
    val query = maintainHistory(spark, s"$base/drops/*",
      keys = Seq("stockcode"), attrs = Seq("unitprice"),
      historyPath = s"$base/history", maxFilesPerTrigger = Some(1))
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    if (!query.awaitTermination(300000L)) {
      query.stop()
      throw new IllegalStateException(
        "stream_scd2_roundtrip did not finish within 300 s; history is partial")
    }
    readHistory(spark, s"$base/history")
      .withColumn("unitprice", col("unitprice").cast("double"))
  }

  /** The 2020-01-15 point-in-time read of the same history — must equal the
    * v1 dimension exactly (every version open, none of the v2 churn). */
  private def productScd2AsOf(spark: SparkSession, dir: String): DataFrame =
    asOfSnapshot(productScd2(spark, dir), "2020-01-15 00:00:00")
      .select("stockcode", "unitprice")

  /** The fact side of the temporal-lookup scenarios: every ELT fact row
    * with its event time decoded from the smart key. */
  private def temporalFact(w: Warehouse): DataFrame =
    w.factSalesElt.select(
      col("invoiceid"), col("stockcode"), col("linenumber"),
      to_timestamp(col("date_key").cast("string"), "yyyyMMddHHmmss")
        .cast("timestamp_ntz").as("t"))

  private def temporalProjection(df: DataFrame): DataFrame =
    df.select(col("invoiceid"), col("stockcode"), col("linenumber"), col("t"),
      col("asof.unitprice").cast("double").as("version_price"),
      col("asof.valid_from").as("version_from"))

  /** Oracle scenario for [[temporalLookup]]: the same churn versioned
    * INSIDE the fact's date range (v1 at 1995, v2 at 1998), every fact row
    * decoding its event time from the smart key — facts before 1998 must
    * see v1 prices, later ones v2 (or nothing, for keys v2 deleted);
    * stockcodes outside the dim and pre-1995 times match no version. */
  private def factScd2Temporal(spark: SparkSession, dir: String): DataFrame = {
    val w = Warehouse(spark, dir)
    val (v1, v2) = productSnapshots(w)
    val hist = merge(initialLoad(v1, "1995-01-01 00:00:00"), v2,
      keys = Seq("stockcode"), attrs = Seq("unitprice"), asOf = "1998-01-01 00:00:00")
    temporalProjection(temporalLookup(temporalFact(w), hist, Seq("stockcode"), "t"))
  }

  /** Continuous temporal enrichment (r11) — the streaming face of
    * [[temporalLookup]]: a fact drop directory enriched per micro-batch
    * against the segmented history store (stream-static; the dim-sized
    * [[readHistory]] broadcasts, each batch's facts never shuffle) with
    * results appended. Composes the round's store with the r10 lookup;
    * the roundtrip must equal the batch temporal join row-for-row, so it
    * SHARES `fact_scd2_temporal_join`'s oracle. */
  private def streamScd2EnrichRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val w = Warehouse(spark, dir)
    val (v1, v2) = productSnapshots(w)
    val base = java.nio.file.Files.createTempDirectory("graft_scd2_enrich_").toString
    foldSnapshot(spark, v1, "1995-01-01 00:00:00",
      Seq("stockcode"), Seq("unitprice"), s"$base/hist")
    foldSnapshot(spark, v2, "1998-01-01 00:00:00",
      Seq("stockcode"), Seq("unitprice"), s"$base/hist")
    val fact = temporalFact(w)
    fact.filter(col("invoiceid").cast("long") % 2 === 0)
      .coalesce(1).write.parquet(s"$base/drops/a")
    fact.filter(col("invoiceid").cast("long") % 2 =!= 0)
      .coalesce(1).write.parquet(s"$base/drops/b")
    val hist = readHistory(spark, s"$base/hist")
    val query = spark.readStream
      .schema(spark.read.parquet(s"$base/drops/*").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$base/drops/*")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        temporalProjection(temporalLookup(batch, hist, Seq("stockcode"), "t"))
          .write.mode("append").parquet(s"$base/out")
        ()
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    if (!query.awaitTermination(300000L)) {
      query.stop()
      throw new IllegalStateException(
        "stream_scd2_enrich_roundtrip did not finish within 300 s; output is partial")
    }
    spark.read.parquet(s"$base/out")
  }

  private val CT1 = "2021-01-01 00:00:00"
  private val CT2 = "2021-02-01 00:00:00"
  private val CT3 = "2021-03-01 00:00:00"
  private val CT4 = "2021-04-01 00:00:00"

  /** Multi-attribute churn for the customer dim (r11, VERDICT r10 #1a):
    * TWO tracked attributes across THREE distinct snapshots, churn derived
    * from the data (cid = the numeric customerid):
    *   v2: every 3rd customer relocates (country suffix), every 5th gets a
    *       name title — keys divisible by 15 change both attrs at once;
    *   v3 (state on top of v2): every 7th customer deleted, every 4th
    *       moves to 'Atlantis'. */
  private def customerSnapshots(w: Warehouse): (DataFrame, DataFrame, DataFrame) = {
    val cid = col("customerid").cast("long")
    val v1 = w.dimCustomer.select("customerid", "customername", "country")
    val v2 = v1
      .withColumn("customername",
        when(cid % 5 === 0, concat(lit("Dr. "), col("customername")))
          .otherwise(col("customername")))
      .withColumn("country",
        when(cid % 3 === 0, concat(col("country"), lit(" (Relocated)")))
          .otherwise(col("country")))
    val v3 = v2.filter(cid % 7 =!= 0)
      .withColumn("country",
        when(cid % 4 === 0, lit("Atlantis")).otherwise(col("country")))
    (v1, v2, v3)
  }

  private val custKeys = Seq("customerid")
  private val custAttrs = Seq("customername", "country")

  /** Batch path: four chained merges over the generic `attrs` API — the
    * fourth folds v3 AGAIN at a later asOf, gate-proving that an unchanged
    * snapshot is a no-op (no spurious versions) at the oracle, not just in
    * Scd2Spec. */
  private def customerScd2Multi(spark: SparkSession, dir: String): DataFrame = {
    val (v1, v2, v3) = customerSnapshots(Warehouse(spark, dir))
    val h2 = merge(initialLoad(v1, CT1), v2, custKeys, custAttrs, CT2)
    val h3 = merge(h2, v3, custKeys, custAttrs, CT3)
    merge(h3, v3, custKeys, custAttrs, CT4)
  }

  /** The SAME four folds through the segmented store — gate-proving the
    * append-only layout end-to-end (initial load, two real folds, one
    * no-op fold) against the identical row-by-row oracle. */
  private def customerScd2Store(spark: SparkSession, dir: String): DataFrame = {
    val (v1, v2, v3) = customerSnapshots(Warehouse(spark, dir))
    val root = java.nio.file.Files.createTempDirectory("graft_scd2_store_").toString + "/hist"
    foldSnapshot(spark, v1, CT1, custKeys, custAttrs, root)
    foldSnapshot(spark, v2, CT2, custKeys, custAttrs, root)
    foldSnapshot(spark, v3, CT3, custKeys, custAttrs, root)
    foldSnapshot(spark, v3, CT4, custKeys, custAttrs, root)
    readHistory(spark, root)
  }

  /** The same fold chain, then [[compactSegments]] — the compacted store
    * must read back the identical history (same oracle), gating that
    * segment retirement loses and duplicates nothing. */
  private def customerScd2Compact(spark: SparkSession, dir: String): DataFrame = {
    val (v1, v2, v3) = customerSnapshots(Warehouse(spark, dir))
    val root = java.nio.file.Files.createTempDirectory("graft_scd2_cmp_").toString + "/hist"
    foldSnapshot(spark, v1, CT1, custKeys, custAttrs, root)
    foldSnapshot(spark, v2, CT2, custKeys, custAttrs, root)
    foldSnapshot(spark, v3, CT3, custKeys, custAttrs, root)
    require(compactSegments(spark, root), "expected a multi-segment compaction")
    foldSnapshot(spark, v3, CT4, custKeys, custAttrs, root) // store keeps working after
    readHistory(spark, root)
  }

  /** The fold chain, then an erasure purge of every 10th customer across
    * the whole store (r12). Every victim IS multi-version (cid%10 ⇒ cid%5 ⇒
    * the T2 title change closed its v1 row), so the purge must genuinely
    * rewrite closed segments — the require turns a no-op purge RED. The
    * oracle is the full-history spec minus the victims, so a surviving
    * victim version (open or closed) or a lost survivor hash-mismatches. */
  private def customerScd2Purged(spark: SparkSession, dir: String): DataFrame = {
    val (v1, v2, v3) = customerSnapshots(Warehouse(spark, dir))
    val root = java.nio.file.Files.createTempDirectory("graft_scd2_purge_").toString + "/hist"
    foldSnapshot(spark, v1, CT1, custKeys, custAttrs, root)
    foldSnapshot(spark, v2, CT2, custKeys, custAttrs, root)
    foldSnapshot(spark, v3, CT3, custKeys, custAttrs, root)
    foldSnapshot(spark, v3, CT4, custKeys, custAttrs, root)
    val tombstones = v1.filter(col("customerid").cast("long") % 10 === 0)
      .select("customerid")
    require(purgeKeys(spark, root, tombstones, custKeys).nonEmpty,
      "the purge must rewrite at least one closed segment")
    readHistory(spark, root)
  }

  // Row-by-row semantic spec of the 3-snapshot multi-attr history. A
  // "change" is a VALUE change (IS DISTINCT FROM — the null-safe compare):
  // a NULL-country key hit by the %3 relocation rule still has a NULL
  // country afterwards (concat with NULL), so no version turns over.
  //   version1 closes at T2 iff any attr value changed, else at T3 iff
  //   deleted (cid%7) or moved to Atlantis (cid%4), else stays open;
  //   version2 exists iff changed at T2, closing at T3 on the same terms;
  //   version3 exists iff the key survives T3 AND moves to Atlantis
  //   ('Atlantis' differs from every ctry2 value, including NULL).
  //   The T4 re-fold of the identical snapshot adds NOTHING.
  private val customerMultiOracle = oq(s"""
      , mc AS (SELECT customerid, CAST(customerid AS BIGINT) AS cid,
                      customername, country
               FROM dim_customer),
      mc2 AS (SELECT *,
                CASE WHEN cid % 5 = 0 THEN 'Dr. ' || customername
                     ELSE customername END AS name2,
                CASE WHEN cid % 3 = 0 THEN country || ' (Relocated)'
                     ELSE country END AS ctry2
              FROM mc),
      mc3 AS (SELECT *,
                (name2 IS DISTINCT FROM customername
                 OR ctry2 IS DISTINCT FROM country) AS chg12
              FROM mc2)
      SELECT customerid, customername, country,
             TIMESTAMP '$CT1' AS valid_from,
             CASE WHEN chg12 THEN TIMESTAMP '$CT2'
                  WHEN cid % 7 = 0 OR cid % 4 = 0 THEN TIMESTAMP '$CT3'
                  END AS valid_to
      FROM mc3
      UNION ALL
      SELECT customerid, name2 AS customername, ctry2 AS country,
             TIMESTAMP '$CT2' AS valid_from,
             CASE WHEN cid % 7 = 0 OR cid % 4 = 0 THEN TIMESTAMP '$CT3'
                  END AS valid_to
      FROM mc3 WHERE chg12
      UNION ALL
      SELECT customerid, name2 AS customername, 'Atlantis' AS country,
             TIMESTAMP '$CT3' AS valid_from, NULL AS valid_to
      FROM mc3 WHERE cid % 7 <> 0 AND cid % 4 = 0""")

  // The same semantic spec minus the purged keys (cid % 10) — every
  // version of a victim is gone, every survivor version untouched.
  private val customerPurgedOracle = oq(s"""
      , mc AS (SELECT customerid, CAST(customerid AS BIGINT) AS cid,
                      customername, country
               FROM dim_customer),
      mc2 AS (SELECT *,
                CASE WHEN cid % 5 = 0 THEN 'Dr. ' || customername
                     ELSE customername END AS name2,
                CASE WHEN cid % 3 = 0 THEN country || ' (Relocated)'
                     ELSE country END AS ctry2
              FROM mc),
      mc3 AS (SELECT *,
                (name2 IS DISTINCT FROM customername
                 OR ctry2 IS DISTINCT FROM country) AS chg12
              FROM mc2)
      SELECT customerid, customername, country,
             TIMESTAMP '$CT1' AS valid_from,
             CASE WHEN chg12 THEN TIMESTAMP '$CT2'
                  WHEN cid % 7 = 0 OR cid % 4 = 0 THEN TIMESTAMP '$CT3'
                  END AS valid_to
      FROM mc3 WHERE cid % 10 <> 0
      UNION ALL
      SELECT customerid, name2 AS customername, ctry2 AS country,
             TIMESTAMP '$CT2' AS valid_from,
             CASE WHEN cid % 7 = 0 OR cid % 4 = 0 THEN TIMESTAMP '$CT3'
                  END AS valid_to
      FROM mc3 WHERE chg12 AND cid % 10 <> 0
      UNION ALL
      SELECT customerid, name2 AS customername, 'Atlantis' AS country,
             TIMESTAMP '$CT3' AS valid_from, NULL AS valid_to
      FROM mc3 WHERE cid % 7 <> 0 AND cid % 4 = 0 AND cid % 10 <> 0""")

  // The oracle spells out the merged history row-by-row (the semantic
  // spec, not a replay of the implementation): v1 rows close iff changed
  // (+1.00 is always a change) or deleted; changed v2 rows reopen.
  private val mergedHistoryOracle = oq("""
      , pv1 AS (SELECT stockcode, CAST(stockcode AS BIGINT) AS code, unitprice
                FROM dim_product)
      SELECT stockcode, CAST(unitprice AS DOUBLE) AS unitprice,
             TIMESTAMP '2020-01-01 00:00:00' AS valid_from,
             CASE WHEN code % 17 = 0 OR code % 3 = 0
                  THEN TIMESTAMP '2020-02-01 00:00:00' END AS valid_to
      FROM pv1
      UNION ALL
      SELECT stockcode, CAST(unitprice + 1.00 AS DOUBLE) AS unitprice,
             TIMESTAMP '2020-02-01 00:00:00' AS valid_from,
             NULL AS valid_to
      FROM pv1 WHERE code % 3 = 0 AND code % 17 <> 0""")

  def defs: Seq[QueryDef] = Seq(
    QueryDef("dim_product_scd2", productScd2, Some(mergedHistoryOracle)),

    QueryDef("dim_customer_scd2_multi", customerScd2Multi, Some(customerMultiOracle)),

    // segmented-store fold chain ≡ batch merge chain: same oracle
    QueryDef("dim_customer_scd2_store", customerScd2Store, Some(customerMultiOracle)),

    // compaction retires segments without changing the readable history
    QueryDef("dim_customer_scd2_compact", customerScd2Compact, Some(customerMultiOracle)),

    // erasure across the whole version history: the purge rewrites exactly
    // the victim-holding segments and the open set (r12)
    QueryDef("dim_customer_scd2_purged", customerScd2Purged, Some(customerPurgedOracle)),

    QueryDef("dim_product_scd2_asof", productScd2AsOf, Some(oq("""
      SELECT stockcode, CAST(unitprice AS DOUBLE) AS unitprice
      FROM dim_product"""))),

    // stream-maintained history ≡ batch merge: same oracle, by construction
    // of the roundtrip (the equivalence is gate-checked, not assumed)
    QueryDef("stream_scd2_roundtrip", streamScd2Roundtrip, Some(mergedHistoryOracle)),

    // the oracle replays version selection as CASE logic over the fact's
    // decoded time — deleted keys and pre-history times fall to NULL
    QueryDef("fact_scd2_temporal_join", factScd2Temporal, Some(temporalJoinOracle)),

    // stream-enriched ≡ batch temporal join, by roundtrip construction
    QueryDef("stream_scd2_enrich_roundtrip", streamScd2EnrichRoundtrip,
      Some(temporalJoinOracle))
  )

  private lazy val temporalJoinOracle = oq("""
      SELECT f.invoiceid, f.stockcode, f.linenumber,
             strptime(CAST(f.date_key AS VARCHAR), '%Y%m%d%H%M%S') AS t,
             CAST(CASE
               WHEN p.stockcode IS NULL THEN NULL
               WHEN strptime(CAST(f.date_key AS VARCHAR), '%Y%m%d%H%M%S') < TIMESTAMP '1995-01-01' THEN NULL
               WHEN strptime(CAST(f.date_key AS VARCHAR), '%Y%m%d%H%M%S') >= TIMESTAMP '1998-01-01'
                    AND CAST(p.stockcode AS BIGINT) % 17 = 0 THEN NULL
               WHEN strptime(CAST(f.date_key AS VARCHAR), '%Y%m%d%H%M%S') >= TIMESTAMP '1998-01-01'
                    AND CAST(p.stockcode AS BIGINT) % 3 = 0 THEN p.unitprice + 1.00
               ELSE p.unitprice END AS DOUBLE) AS version_price,
             CASE
               WHEN p.stockcode IS NULL THEN NULL
               WHEN strptime(CAST(f.date_key AS VARCHAR), '%Y%m%d%H%M%S') < TIMESTAMP '1995-01-01' THEN NULL
               WHEN strptime(CAST(f.date_key AS VARCHAR), '%Y%m%d%H%M%S') >= TIMESTAMP '1998-01-01'
                    AND CAST(p.stockcode AS BIGINT) % 17 = 0 THEN NULL
               WHEN strptime(CAST(f.date_key AS VARCHAR), '%Y%m%d%H%M%S') >= TIMESTAMP '1998-01-01'
                    AND CAST(p.stockcode AS BIGINT) % 3 = 0 THEN TIMESTAMP '1998-01-01'
               ELSE TIMESTAMP '1995-01-01' END AS version_from
      FROM fact_sales_elt f
      LEFT JOIN dim_product p ON f.stockcode = p.stockcode""")
}
