package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{Compaction, VersionedStats, VersionedTable}

/** Automatic data skipping through the optimizer (r13) — the serving face
  * of [[graft.sources.VersionedStats]] that needs NO API change: a plain
  * `VersionedTable.read(root).filter(...)` (or any SQL over a view of it)
  * gets its parquet scan swapped for one that lists ONLY the files whose
  * registered stats admit the filter. This is the Catalyst-integrated shape
  * of what `VersionedStats.prunedRead` does explicitly — the same move a
  * production table format makes in its scan builder, expressed as a
  * `Rule[LogicalPlan]` like its sibling [[MvRewrite]].
  *
  * Mechanics, all driver-side metadata (the rule never launches a job):
  *  - [[register]] pins (snapshot directory → indexed columns + the
  *    COLLECTED stats rows) for a table's current version — the same
  *    driver-resident footprint every planner's file index already holds;
  *  - the rule matches `Filter` over a scan of a registered snapshot,
  *    extracts conservative per-column boxes from the filter's conjuncts
  *    (`a >= lit` / `a > lit` / `a <= lit` / `a < lit` / `a = lit`, either
  *    operand order, attribute and literal type-identical — anything else
  *    contributes no box, which is always sound), admits files against the
  *    stats with Catalyst's own comparison semantics (null stats admit),
  *    and rebuilds the relation over the surviving paths, KEEPING the
  *    original output exprIds so every operator above — including the
  *    filter itself, which stays for exactness — binds unchanged;
  *  - no boxes, nothing pruned, or any shape surprise → the plan is left
  *    untouched.
  *
  * Session discipline matches [[MvRewrite]]: inert unless
  * `spark.graft.statsPrune.enabled=true` AND the scan's location is
  * registered; attach via `spark.experimental.extraOptimizations` (the
  * [[servingScoped]] harness does both and restores the conf).
  *
  * Staleness closes itself two ways:
  *  - COMMIT time (r14, VERDICT r13 #2): [[register]] installs a
  *    [[VersionedTable]] commit listener for its root, so every later DML
  *    commit FROM THIS PROCESS refreshes the stats incrementally
  *    ([[VersionedStats.refresh]] — a commit rewriting k files re-stats k)
  *    and re-pins the registration at the new head, the way a production
  *    format's scan builder reads the stats out of the commit it serves;
  *  - PLAN time (r15, VERDICT r14 #4): a commit from ANOTHER process moves
  *    `_latest` without firing this process's listeners, so the next read
  *    scans a head directory no registration pins. When the rule sees a
  *    filter over exactly that directory — the current head of a root with
  *    a live registration — it runs the same refresh+re-pin inline (one
  *    tiny manifest read decides; the refresh itself is change-sized) and
  *    prunes against the fresh registration, closing the cross-process
  *    window with no human in the loop.
  * Superseded registrations are KEPT (bounded to the newest few versions
  * per root — each holds per-file stats rows, so unbounded history would
  * be a driver-memory leak): a time-travel read of a retained older
  * version keeps pruning under its own version's stats (ADVICE r14). A
  * failed auto-refresh logs and leaves the old registrations in place —
  * old-version reads keep pruning correctly and new-head reads fall back
  * to full scans, never wrong answers.
  */
object StatsPrune extends Rule[LogicalPlan] with PredicateHelper {

  val EnabledKey = "spark.graft.statsPrune.enabled"

  /** One registered snapshot: the table root it came from, its version,
    * the qualified URI SET of its manifest's files (r16 — under the shared
    * `_data` pool every snapshot is a file set, so the set IS the scan
    * identity: a head read matches its registration exactly, a time-travel
    * read matches its own version's pin, and an already-pruned subset
    * matches nothing), the pool directory reads resolve under, the read
    * schema the snapshot serves under, indexed columns with their types,
    * and the collected stats — per file (pool-relative part/name), per
    * indexed column, the (min, max) as EXTERNAL Scala values (null = null
    * stats). */
  final case class Registration(root: String, version: Int,
      pathSet: Set[String], dir: String, schema: StructType,
      colTypes: Map[String, DataType], files: Seq[FileStats])
  final case class FileStats(part: String, name: String,
      minMax: Map[String, (Any, Any)],
      blooms: Map[String, Array[Byte]] = Map.empty,
      nRows: Long = 0L)

  private val registry =
    new java.util.concurrent.CopyOnWriteArrayList[Registration]()

  /** Versions of per-root registration history retained (ADVICE r14): the
    * newest `HistoryKeep` version pins survive re-registration, so recent
    * time-travel reads keep pruning; older pins are dropped to bound the
    * driver-resident stats footprint. */
  private val HistoryKeep = 4

  /** Max total serialized-bloom bytes a registration may pin driver-side. */
  private val BloomPinBudgetBytes = 256L << 20

  /** The registration snapshot for the CURRENT head of `root` (stats must
    * already be published for it). */
  private def registrationFor(spark: SparkSession, root: String): Registration = {
    val v = VersionedTable.latestVersion(spark, root)
    val cols = VersionedStats.indexedColumns(spark, root).getOrElse(
      throw new IllegalStateException(s"stats never enabled at $root"))
    val dir = VersionedTable.dataDir(root)
    val schema = VersionedTable.effectiveSchema(spark, root, v)
      .getOrElse(VersionedTable.read(spark, root, Some(v)).schema)
    val stats = VersionedStats.statsFor(spark, root, v)
    val st = stats.schema
    val colTypes = cols.map(c => c -> st(s"${c}_min").dataType).toMap
    val bloomCols = cols.filter(c => st.fieldNames.contains(s"${c}_bloom"))
    val rows = stats.collect().toSeq.map { r =>
      FileStats(r.getAs[String]("part"), r.getAs[String]("file_id"),
        cols.map(c => c -> ((r.getAs[Any](s"${c}_min"), r.getAs[Any](s"${c}_max")))).toMap,
        bloomCols.map(c => c -> r.getAs[Array[Byte]](s"${c}_bloom")).toMap,
        r.getAs[Long]("n_rows"))
    }
    // driver-residency guard: min/max pairs are bytes per file, but blooms
    // are KBs–MBs each — at a large enough file count holding them in the
    // registry would poison driver memory. Past the budget the pins keep
    // min/max only (sound: bloom-less point boxes admit), and the note
    // names the remedy (smaller expectedItemsPerFile, or pointRead which
    // consults the stats table per probe without pinning anything).
    val bloomBytes = rows.iterator
      .flatMap(_.blooms.valuesIterator).filter(_ != null).map(_.length.toLong).sum
    val bounded =
      if (bloomBytes <= BloomPinBudgetBytes) rows
      else {
        System.err.println(s"[graft] StatsPrune: $root blooms total " +
          s"${bloomBytes >> 20} MiB > budget ${BloomPinBudgetBytes >> 20} MiB — " +
          "pinning min/max only (use pointRead, or size blooms smaller)")
        rows.map(_.copy(blooms = Map.empty))
      }
    Registration(root, v, VersionedTable.snapshotPathSet(spark, root, v),
      dir, schema, colTypes, bounded)
  }

  /** Pin `reg`, keeping superseded older-version pins for its root (their
    * stats are theirs forever — time-travel reads keep pruning) up to the
    * [[HistoryKeep]] bound. */
  private def pin(reg: Registration): Unit = {
    registry.removeIf(r => r.root == reg.root && r.version == reg.version)
    registry.add(reg)
    val versions = registry.asScala.collect {
      case r if r.root == reg.root => r.version }.toSeq.sorted
    if (versions.size > HistoryKeep) {
      val cutoff = versions(versions.size - HistoryKeep)
      registry.removeIf(r => r.root == reg.root && r.version < cutoff)
    }
  }

  /** Register the CURRENT version of the versioned table at `root` for
    * automatic pruning (stats must be published — enable/refresh first),
    * and keep the registration CURRENT: a commit listener refreshes the
    * stats incrementally and re-pins the registration at every later
    * commit to this root (r14 — no manual re-register after DML), and the
    * plan-time head check covers commits made by OTHER processes (r15).
    * Returns the number of files registered. */
  def register(spark: SparkSession, root: String): Int = {
    val reg = registrationFor(spark, root)
    pin(reg)
    VersionedTable.setCommitListener(s"statsprune:$root", (s, r, _) =>
      // fire only while a registration for this root is live: a clear()ed
      // rule must not resurrect itself on a later commit
      if (r == root && registry.asScala.exists(_.root == root)) {
        VersionedStats.refresh(s, root)
        pin(registrationFor(s, root))
      })
    reg.files.size
  }

  def clear(): Unit = {
    registry.asScala.map(_.root).toSet[String]
      .foreach(r => VersionedTable.clearCommitListener(s"statsprune:$r"))
    registry.clear()
  }

  /** Detach ONLY the commit listener for `root`, keeping the registrations
    * (and with them the plan-time head check) — how a commit from ANOTHER
    * writer process looks to this one: its in-process listeners never fire,
    * the table head moves anyway. The cross-process gate row commits DML
    * behind this and requires the next read to still prune. */
  def detachListenerKeepHeadCheck(root: String): Unit =
    VersionedTable.clearCommitListener(s"statsprune:$root")

  /** Run `body` with the rule attached + enabled, hand back an eagerly
    * materialized copy, and restore the conf (the [[MvRewrite.servingScoped]]
    * discipline — a gate must not leave the rule active for later queries). */
  def servingScoped(spark: SparkSession)(body: => org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    PlanRuleSupport.scopedWith(spark, this, Seq(EnabledKey))(body)

  private def qualify(spark: SparkSession, path: String): String =
    PlanRuleSupport.qualify(spark, path)

  private def enabled: Boolean =
    conf.getConfString(EnabledKey, "false").equalsIgnoreCase("true")

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled || registry.isEmpty) plan
    else plan.transform {
      case f @ Filter(cond, child) =>
        findScan(child).flatMap { lr =>
          registrationOf(lr).flatMap(prune(f, cond, child, lr, _))
        }.getOrElse(f)
      // metadata-only aggregates: a global (no-grouping, unfiltered)
      // count(*)/min/max over a registered snapshot is fully answerable
      // from the per-file stats rows — zero data files open, the
      // count-a-100TB-table-in-milliseconds query of the manifest formats
      case a @ Aggregate(Seq(), aggExprs, child, _) =>
        findScan(child).flatMap { lr =>
          registrationOf(lr).flatMap(serveAggregate(a, aggExprs, _))
        }.getOrElse(a)
    }

  private def registrationOf(lr: LogicalRelation): Option[Registration] = {
    val paths: Set[String] = lr.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.map(_.toUri.toString).toSet
      case _ => Set.empty
    }
    // a snapshot scan IS its manifest's qualified file set (r16): exact
    // set equality matches the right version's pin and nothing else — a
    // time-travel read prunes under ITS version's stats, and a scan this
    // rule already pruned (a strict subset) never re-matches
    registry.asScala.find(r => r.pathSet == paths && lr.schema == r.schema)
      .orElse(headHeal(paths, lr.schema))
  }

  /** Serve a global aggregate from the registration's stats rows: count(*)
    * (= Σ n_rows), min(c) (= min of per-file mins, null stats contributing
    * nothing — exactly SQL's null-ignoring MIN), max(c) symmetric, for
    * indexed c. Any other aggregate shape — distinct, FILTER clauses,
    * count(col), expressions over aggregates — bails to the real scan.
    * Soundness leans on the same protocol fact as pruning: the stats rows
    * describe EXACTLY the registered snapshot's files. */
  private def serveAggregate(a: Aggregate, aggExprs: Seq[NamedExpression],
      reg: Registration): Option[LogicalPlan] = {
    def valueOf(ae: AggregateExpression): Option[Any] = {
      if (ae.isDistinct || ae.filter.isDefined) return None
      ae.aggregateFunction match {
        case c: aggregate.Count if c.children == Seq(Literal(1)) ||
            c.children == Seq(Literal(1L)) =>
          Some(reg.files.iterator.map(_.nRows).sum)
        case aggregate.Min(at: AttributeReference) if reg.colTypes.contains(at.name) =>
          val dt = reg.colTypes(at.name)
          val mins = reg.files.iterator.map(_.minMax(at.name)._1).filter(_ != null)
            .map(v => Literal.create(v, dt)).toSeq
          Some(if (mins.isEmpty) null
            else mins.reduce((x, y) => if (lteq(dt, x, y)) x else y).value)
        case aggregate.Max(at: AttributeReference) if reg.colTypes.contains(at.name) =>
          val dt = reg.colTypes(at.name)
          val maxs = reg.files.iterator.map(_.minMax(at.name)._2).filter(_ != null)
            .map(v => Literal.create(v, dt)).toSeq
          Some(if (maxs.isEmpty) null
            else maxs.reduce((x, y) => if (lteq(dt, x, y)) y else x).value)
        case _ => None
      }
    }
    // each output column may be any deterministic expression OVER served
    // aggregates (cast(min(x)), max(a) - min(a), …): substitute every
    // AggregateExpression with its stats-derived literal, then constant-
    // fold the remainder — which must reference nothing else
    val values = aggExprs.map { ne =>
      var servable = true
      val substituted = ne.transformUp {
        case ae: AggregateExpression =>
          valueOf(ae) match {
            case Some(v) => Literal(v, ae.dataType)
            case None => servable = false; ae
          }
      }
      val inner = substituted match {
        case Alias(child, _) => child
        case other => other
      }
      if (!servable || inner.references.nonEmpty || !inner.deterministic) None
      else Some(inner.eval(InternalRow.empty))
    }
    if (values.exists(_.isEmpty)) None // any unservable column → real scan
    else Some(LocalRelation(a.output,
      Seq(InternalRow.fromSeq(values.map(_.get)))))
  }

  /** Plan-time head check (r15, VERDICT r14 #4). Fires only when the
    * scanned location is EXACTLY the current head directory of a root with
    * a live registration and no registration pins that directory yet — the
    * signature of a commit made by another process (this process's commit
    * listener never fired). The decision costs one tiny `_latest` read per
    * registered root; the heal is the listener's own refresh+re-pin.
    * Re-entrancy guarded: the refresh launches Spark jobs whose plans pass
    * back through this rule. Any failure logs and leaves a full scan —
    * correct, never wrong. */
  private val healing = new ThreadLocal[Boolean] {
    override def initialValue(): Boolean = false
  }

  /** Short-TTL cache of `_latest` per root, used ONLY for scans that are a
    * subset of a pinned set. Such a scan is almost always this rule's own
    * pruned output re-planning (no I/O should be paid per plan node) — but
    * it can also be the head after a SHRINK-ONLY commit (a delete that
    * leaves no replacement file makes the new head a strict subset of the
    * pinned older version), which must still heal. The cache bounds that
    * heal's staleness to the TTL instead of skipping it forever. */
  private val HeadTtlMs = 10000L
  private val headCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Int)]()
  private def cachedLatest(spark: SparkSession, root: String): Int = {
    val now = System.currentTimeMillis()
    headCache.compute(root, (_, prev) =>
      if (prev != null && now - prev._1 < HeadTtlMs) prev
      else (now, VersionedTable.latestVersion(spark, root)))._2
  }

  private def headHeal(paths: Set[String], schema: StructType): Option[Registration] = {
    if (healing.get || paths.isEmpty) return None
    // cheap gate BEFORE any filesystem read (ADVICE r15): a query over an
    // UNRELATED table must not pay a per-registered-root `_latest` read on
    // every plan node — only roots whose qualified pool prefix covers the
    // scanned paths are candidates (the prefix comes from a sample pinned
    // path, no I/O). Subset-of-pinned scans stay candidates (a shrink-only
    // commit's head IS a subset) but read `_latest` through the TTL cache.
    val rootPrefixes: Map[String, String] = registry.asScala.toSeq
      .groupBy(_.root).map { case (r, regs) =>
        r -> regs.head.pathSet.headOption.flatMap { sample =>
          val i = sample.lastIndexOf("/_data/")
          if (i < 0) None else Some(sample.substring(0, i + "/_data".length))
        }.getOrElse {
          // a root pinned while its snapshot was EMPTY has no sample path;
          // qualify the pool dir directly (conf work, no filesystem I/O) —
          // else the root could never heal after another process's commit
          qualify(SparkSession.active,
            graft.sources.VersionedTable.dataDir(r))
        }
      }
    val sampleHead = paths.head
    val roots = rootPrefixes.collect {
      case (r, pre) if sampleHead.startsWith(pre + "/") => r }.toSet
    if (roots.isEmpty) return None
    val subsetOfPinned =
      registry.asScala.exists(r => roots(r.root) && paths.subsetOf(r.pathSet))
    roots.iterator.flatMap { root =>
      try {
        val spark = SparkSession.active
        val head =
          if (subsetOfPinned) cachedLatest(spark, root)
          else {
            val h = VersionedTable.latestVersion(spark, root)
            headCache.put(root, (System.currentTimeMillis(), h))
            h
          }
        if (registry.asScala.exists(r => r.root == root && r.version == head))
          None // the head is pinned; this scan is just not a snapshot read
        else if (VersionedTable.snapshotPathSet(spark, root, head) != paths)
          None // not the head's full file set — an old version, nothing to heal
        else {
          healing.set(true)
          try {
            VersionedStats.refresh(spark, root)
            val fresh = registrationFor(spark, root)
            pin(fresh)
            Some(fresh).filter(f => f.pathSet == paths && f.schema == schema)
          } finally healing.set(false)
        }
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[graft] StatsPrune head check failed for $root: ${e.getMessage}")
          None
      }
    }.nextOption()
  }

  /** The single parquet relation under plain projections, if any. */
  private def findScan(p: LogicalPlan): Option[LogicalRelation] = p match {
    case lr: LogicalRelation => Some(lr)
    case Project(projList, c) if projList.forall(_.isInstanceOf[AttributeReference]) =>
      findScan(c)
    case _ => None
  }

  /** Conservative per-column inclusive bounds from the filter's conjuncts.
    * Strict comparisons relax to inclusive (a superset — sound); conjuncts
    * in any other shape contribute nothing. Bounds keep the predicate's own
    * Literal nodes, so admission compares with exactly Catalyst's
    * semantics for the column's type. */
  private def extractBoxes(cond: Expression,
      colTypes: Map[String, DataType]): Map[String, (Option[Literal], Option[Literal])] = {
    var lo = Map.empty[String, Literal]
    var hi = Map.empty[String, Literal]
    def indexed(a: AttributeReference, l: Literal): Boolean =
      colTypes.get(a.name).contains(a.dataType) && l.dataType == a.dataType &&
        l.value != null
    def tighterLo(c: String, l: Literal): Unit =
      if (!lo.get(c).exists(p => lteq(l.dataType, l, p))) lo += c -> l
    def tighterHi(c: String, l: Literal): Unit =
      if (!hi.get(c).exists(p => lteq(l.dataType, p, l))) hi += c -> l
    splitConjunctivePredicates(cond).foreach {
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) if indexed(a, l) => tighterLo(a.name, l)
      case GreaterThan(a: AttributeReference, l: Literal) if indexed(a, l)        => tighterLo(a.name, l)
      case LessThanOrEqual(a: AttributeReference, l: Literal) if indexed(a, l)    => tighterHi(a.name, l)
      case LessThan(a: AttributeReference, l: Literal) if indexed(a, l)           => tighterHi(a.name, l)
      case EqualTo(a: AttributeReference, l: Literal) if indexed(a, l) =>
        tighterLo(a.name, l); tighterHi(a.name, l)
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) if indexed(a, l) => tighterHi(a.name, l)
      case GreaterThan(l: Literal, a: AttributeReference) if indexed(a, l)        => tighterHi(a.name, l)
      case LessThanOrEqual(l: Literal, a: AttributeReference) if indexed(a, l)    => tighterLo(a.name, l)
      case LessThan(l: Literal, a: AttributeReference) if indexed(a, l)           => tighterLo(a.name, l)
      case EqualTo(l: Literal, a: AttributeReference) if indexed(a, l) =>
        tighterLo(a.name, l); tighterHi(a.name, l)
      case EqualNullSafe(a: AttributeReference, l: Literal) if indexed(a, l) =>
        tighterLo(a.name, l); tighterHi(a.name, l)
      case EqualNullSafe(l: Literal, a: AttributeReference) if indexed(a, l) =>
        tighterLo(a.name, l); tighterHi(a.name, l)
      // IN-list → the [min, max] envelope of its literals (conservative:
      // a file overlapping the envelope but containing none of the values
      // is admitted and cleared by the exactness filter)
      case In(a: AttributeReference, list)
          if colTypes.get(a.name).contains(a.dataType) && list.nonEmpty &&
            list.forall {
              case l: Literal => l.dataType == a.dataType && l.value != null
              case _ => false
            } =>
        val ls = list.collect { case l: Literal => l }
        tighterLo(a.name, ls.reduce((x, y) => if (lteq(a.dataType, x, y)) x else y))
        tighterHi(a.name, ls.reduce((x, y) => if (lteq(a.dataType, x, y)) y else x))
      // LIKE 'abc%' (the optimizer has already simplified it to StartsWith
      // by the time user-provided rules run) → the [prefix, prefix⁺) box:
      // every string with the prefix is >= the prefix, and < the prefix
      // with its last char incremented — kept inclusive (a superset, sound)
      case StartsWith(a: AttributeReference, l: Literal)
          if colTypes.get(a.name).contains(StringType) &&
            a.dataType == StringType && l.value != null =>
        val u = l.value.asInstanceOf[UTF8String]
        if (u.numBytes > 0) {
          tighterLo(a.name, Literal(u, StringType))
          prefixUpper(u).foreach(up =>
            tighterHi(a.name, Literal(up, StringType)))
        }
      case _ => // no box — sound
    }
    (lo.keySet ++ hi.keySet).map(c => c -> ((lo.get(c), hi.get(c)))).toMap
  }

  /** An upper bound ABOVE every string with prefix `s`, computed over the
    * prefix's UTF-8 BYTES (the order UTF8String actually compares in — the
    * Delta/Iceberg LIKE-prefix derivation): drop trailing 0xFF bytes,
    * increment the last remaining one. The r15 UTF-16 form (`last char +
    * 1`) was unsound at the surrogate boundary (ADVICE r15): a prefix
    * ending U+D7FF incremented into an unpaired surrogate that re-encoded
    * as '?' (0x3F), an upper bound BELOW the prefix — files holding
    * matching rows were pruned. A byte increment can produce an invalid
    * UTF-8 sequence, which is fine: the bound only ever feeds byte-wise
    * comparisons against file stats, never decoding. None when the prefix
    * is all 0xFF (no upper bound — lo alone still prunes). */
  private[plans] def prefixUpper(s: UTF8String): Option[UTF8String] = {
    val b = s.getBytes
    var i = b.length - 1
    while (i >= 0 && b(i) == -1) i -= 1 // trailing 0xFF bytes have no successor
    if (i < 0) None
    else {
      val out = java.util.Arrays.copyOf(b, i + 1)
      out(i) = (out(i) + 1).toByte
      Some(UTF8String.fromBytes(out))
    }
  }

  /** Per-conjunct point sets for bloom admission: `c = v` contributes
    * {v}, `c IN (v1…vk)` contributes {v1…vk} — a file admits the conjunct
    * when ANY of its values might be present. Only bloom-indexed columns
    * matter; everything else is the box path's business. */
  private def extractPointSets(cond: Expression,
      colTypes: Map[String, DataType]): Seq[(String, Seq[Literal])] = {
    def ok(a: AttributeReference, l: Literal): Boolean =
      colTypes.get(a.name).contains(a.dataType) && l.dataType == a.dataType &&
        l.value != null
    splitConjunctivePredicates(cond).flatMap {
      case EqualTo(a: AttributeReference, l: Literal) if ok(a, l) => Some(a.name -> Seq(l))
      case EqualTo(l: Literal, a: AttributeReference) if ok(a, l) => Some(a.name -> Seq(l))
      case EqualNullSafe(a: AttributeReference, l: Literal) if ok(a, l) => Some(a.name -> Seq(l))
      case EqualNullSafe(l: Literal, a: AttributeReference) if ok(a, l) => Some(a.name -> Seq(l))
      case In(a: AttributeReference, list) if list.nonEmpty && list.forall {
            case l: Literal => ok(a, l)
            case _ => false
          } =>
        Some(a.name -> list.collect { case l: Literal => l })
      case _ => None
    }
  }

  /** Catalyst-semantics `x <= y` over one literal pair (constant-fold
    * evaluation — no job, no codegen). */
  private def lteq(dt: DataType, x: Literal, y: Literal): Boolean =
    LessThanOrEqual(x, y).eval(null).asInstanceOf[Boolean]

  private def statLit(dt: DataType, external: Any): Literal =
    Literal.create(external, dt) // converts the Row's external value

  private def prune(f: Filter, cond: Expression, child: LogicalPlan,
      lr: LogicalRelation, reg: Registration): Option[LogicalPlan] = {
    val boxes = extractBoxes(cond, reg.colTypes)
    // point sets (equality / IN) on bloom-indexed columns consult the
    // per-file membership sketches — the pruning min/max can't do when
    // every file's range spans the probe values; a null bloom (pre-bloom
    // stats row, all-null column) admits, and a file admits a conjunct
    // when ANY of its values might be present
    val pointSets = extractPointSets(cond, reg.colTypes)
      .filter { case (c, _) => reg.files.headOption.exists(_.blooms.contains(c)) }
    if (boxes.isEmpty && pointSets.isEmpty) return None
    val surviving = reg.files.filter { fileRow =>
      boxes.forall { case (c, (loB, hiB)) =>
        val dt = reg.colTypes(c)
        val (mn, mx) = fileRow.minMax(c)
        mn == null || ( // null stats (all-null column) always admit
          loB.forall(l => lteq(dt, l, statLit(dt, mx))) &&
          hiB.forall(h => lteq(dt, statLit(dt, mn), h)))
      } && pointSets.forall { case (c, values) =>
        fileRow.blooms.get(c) match {
          case Some(b) => values.exists(VersionedStats.bloomAdmitsLit(b, _))
          case None => true
        }
      }
    }
    if (surviving.size >= reg.files.size) return None // nothing pruned
    val spark = SparkSession.active
    val newScan: LogicalPlan =
      if (surviving.isEmpty) LocalRelation(lr.output)
      else {
        val paths = surviving.map(fr =>
          if (fr.part == ".") s"${reg.dir}/${fr.name}"
          else s"${reg.dir}/${fr.part}/${fr.name}")
        val fresh = spark.read.schema(reg.schema)
          .option("basePath", reg.dir).parquet(paths: _*)
          .queryExecution.analyzed.collectFirst { case l: LogicalRelation => l }
        fresh match {
          // keep the ORIGINAL exprIds: everything above binds unchanged
          case Some(nl) if nl.schema == lr.schema => nl.copy(output = lr.output)
          case _ => return None
        }
      }
    val newChild = child.transformUp { case l: LogicalRelation if l eq lr => newScan }
    Some(Filter(cond, newChild))
  }
}
