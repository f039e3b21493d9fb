package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{FieldName, RelationTimeTravel,
  UnresolvedAttribute, UnresolvedIdentifier, UnresolvedRelation, UnresolvedTable,
  UnresolvedTableValuedFunction}
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{AddCheckConstraint,
  AddColumns, Assignment, CreateTableAsSelect, DeleteAction, DeleteFromTable,
  DropColumns, DropConstraint, InsertAction, InsertIntoStatement,
  InsertStarAction, LogicalPlan, MergeAction, MergeIntoTable, QualifiedColType,
  SubqueryAlias, TruncateTable, UpdateAction, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{expressions => bridge}
import org.apache.spark.sql.types.{StructField, StructType}

/** SQL DML surface (r15, VERDICT r14 #2): `UPDATE` / `DELETE` / `MERGE` /
  * `INSERT` statements routed to the versioned table's verbs — the way a
  * warehouse user actually reaches DML. The reference's own pipelines
  * mutate through SQL statements (`Iteration 1/Group No.6_ETL.sql:141-194`
  * — `UPDATE staging.products_clean SET …`, `UPDATE staging.sales_clean sc
  * SET … WHERE …`), and the engine's whole READ workload is already
  * servable as verbatim SQL ([[SqlSurface]]); this closes the write half,
  * so every DML capability — file-selective copy-on-write, constraint
  * enforcement, CDC feeds, commit listeners, auto-served MVs — is one SQL
  * string away.
  *
  * Statements parse through Spark's OWN SQL parser (`parsePlan` — the full
  * DML grammar, comments, quoting and literal semantics for free); this
  * file walks the resulting catalyst statement plans
  * (`UpdateTable` / `DeleteFromTable` / `MergeIntoTable` /
  * `InsertIntoStatement`) and lowers them onto the verbs, rewriting alias
  * qualifiers in the UNRESOLVED expression trees (`ta.c` → target column
  * `c`, `sa.c` → the [[Dml.src]] source reference a matched clause reads).
  * Unqualified columns in matched clauses are target columns, as in SQL
  * MERGE. Statement → verb routing (each returns the committed version):
  *
  *  - `DELETE FROM t [alias] [WHERE p]`   → [[VersionedTable.deleteWhere]]
  *  - `UPDATE t [alias] SET a = e, … [WHERE p]`
  *      → [[VersionedTable.updateWhere]], or [[VersionedTable.updateMove]]
  *        automatically when an assignment touches a partition column (the
  *        row-move form `updateWhere` rejects by contract)
  *  - `UPDATE t [alias] SET … FROM s [alias] WHERE …` (the Postgres
  *    join-UPDATE the reference's own ETL uses) → pre-lowered onto the
  *    equivalent `MERGE … WHEN MATCHED UPDATE` (see [[updateFromPlan]])
  *  - `INSERT INTO t [(cols)] SELECT …|VALUES …` / `INSERT OVERWRITE t …`
  *      → [[VersionedTable.insertInto]] (column-list and `BY NAME` forms
  *        align by name with null-fill; the bare form maps positionally)
  *  - `MERGE INTO t [AS] ta USING src|(subquery) [AS] sa ON ta.k = sa.k [AND …]
  *     WHEN MATCHED [AND c] THEN UPDATE SET …|* | DELETE      (ordered)
  *     WHEN NOT MATCHED [AND c] THEN INSERT * | (cols) VALUES (sa.cols)
  *     WHEN NOT MATCHED BY SOURCE [AND c] THEN UPDATE SET … | DELETE`
  *      → [[VersionedTable.mergeClauses]] (partition columns auto-derived
  *        from the head snapshot's layout so inserts route correctly)
  *  - DDL: `CREATE TABLE [IF NOT EXISTS] name [PARTITIONED BY (cols)] AS
  *    SELECT` → [[VersionedTable.create]]; `ALTER TABLE … ADD COLUMNS` →
  *    [[VersionedTable.evolve]]; `ALTER TABLE … DROP COLUMN[S] [IF
  *    EXISTS]` → [[VersionedTable.dropColumns]]; `ALTER TABLE … ADD
  *    CONSTRAINT n CHECK (e)` / `DROP CONSTRAINT` → the constraint log;
  *    `TRUNCATE TABLE` → delete-all — the whole table lifecycle, SQL-driven
  *
  * Table names resolve through the caller's `tables` map (name →
  * versioned-table root) — the engine's catalog surface. Inside a MERGE
  * subquery source or an INSERT's SELECT, relation names in the map
  * substitute to the versioned table's CURRENT snapshot (so a statement
  * can read the very table it mutates — the read pins to the pre-commit
  * version, exactly a production format's snapshot isolation); other
  * names resolve as session views.
  *
  * Deliberate bounds (each fails loudly, never silently re-interprets):
  * MERGE keys must be same-named equi-columns (the verb's contract);
  * `INSERT` inside MERGE must be the identity mapping (`*`, or every
  * VALUES item the same-named source column — project the USING subquery
  * for anything else); one `WHEN NOT MATCHED` clause; nested-field
  * assignment, static `PARTITION` specs, and `MERGE … WITH SCHEMA
  * EVOLUTION` are rejected.
  */
object SqlDml extends graft.QueryRegistry {

  /** Execute one DML statement against the versioned tables in `tables`
    * (logical name → table root). Returns the committed version. */
  def execute(spark: SparkSession, sql: String,
      tables: Map[String, String]): Int =
    maintenanceStatement(spark, sql, tables).getOrElse {
      val plan =
        try spark.sessionState.sqlParser.parsePlan(sql)
        catch {
          // Spark's grammar lacks Postgres's `UPDATE … FROM`; the rewrite
          // fires ONLY on statements the grammar rejected, so nothing it
          // already parses can be re-interpreted
          case e: org.apache.spark.sql.catalyst.parser.ParseException =>
            updateFromPlan(spark, sql).getOrElse(throw e)
        }
      lower(spark, plan, tables, sql.trim.take(60))
    }

  // ---------------------------------------------------------- UPDATE…FROM
  // The Postgres join-UPDATE (r16, VERDICT r15 #2): the reference's own
  // ETL mutates through exactly this statement (`Iteration 1/Group
  // No.6_ETL.sql:178-181` — the join price-repair). Spark's grammar lacks
  // the form, so it is pre-lowered onto the equivalent MERGE:
  //
  //   UPDATE t [a] SET … FROM s [b] WHERE <conj AND …>
  //     ≡ MERGE INTO t a USING s b ON <equi-key conjuncts>
  //       WHEN MATCHED [AND <residual conjuncts>] THEN UPDATE SET …
  //
  // The WHERE splits by shape: same-named equi-key conjuncts across the
  // two relations become the ON keys (at least one required — a key-less
  // join-UPDATE is a cross join, out of contract), everything else becomes
  // the matched clause's condition. One deliberate STRENGTHENING: where
  // Postgres applies an arbitrary source row when several match, the MERGE
  // verb's cardinality rule fails loudly — nondeterministic data never
  // commits silently.

  private val UpdateFromRe =
    """(?is)\s*UPDATE\s+([\w.]+)(?:\s+(?:AS\s+)?([A-Za-z_]\w*))?\s+SET\s+(.+?)\s+FROM\s+([\w.]+)(?:\s+(?:AS\s+)?([A-Za-z_]\w*))?\s+WHERE\s+(.+?)\s*;?\s*""".r

  /** The rebuilt MERGE plan for a Postgres-form `UPDATE … FROM`, or None
    * when `sql` is not that shape. */
  private[graft] def updateFromPlan(spark: SparkSession,
      sql: String): Option[LogicalPlan] = sql match {
    case UpdateFromRe(t, ta, setList, src, sa, where) =>
      val mergeSql =
        s"MERGE INTO $t ${Option(ta).getOrElse("")} " +
          s"USING $src ${Option(sa).getOrElse("")} ON $where " +
          s"WHEN MATCHED THEN UPDATE SET $setList"
      spark.sessionState.sqlParser.parsePlan(mergeSql) match {
        case m: MergeIntoTable =>
          val tgt = relOf(m.targetTable)
          val srcQuals = m.sourceTable match {
            case SubqueryAlias(id, _) => Set(id.name.toLowerCase)
            case r: UnresolvedRelation =>
              Set(r.multipartIdentifier.last.toLowerCase,
                r.multipartIdentifier.mkString(".").toLowerCase)
            case _ => Set.empty[String]
          }
          val (keyConjs, residual) = onConjuncts(m.mergeCondition)
            .partition(equiKeyOf(_, tgt.quals, srcQuals).isDefined)
          require(keyConjs.nonEmpty,
            s"UPDATE … FROM needs at least one same-named equi-join conjunct " +
              s"in its WHERE (t.k = s.k): ${sql.trim.take(120)}")
          Some(m.copy(
            mergeCondition = keyConjs.reduce(And),
            matchedActions = m.matchedActions.map {
              case u: UpdateAction => UpdateAction(residual.reduceOption(And),
                u.assignments)
              case other => other
            }))
        case _ => None
      }
    case _ => None
  }

  // The two maintenance statements Spark's grammar doesn't know (the
  // lakehouse-format surface): parsed here by fixed shape, BEFORE
  // parsePlan would reject them.
  //   OPTIMIZE t [TARGET <bytes>]            → VersionedTable.compact
  //   OPTIMIZE t ZORDER BY (c1, …)           → VersionedTable.cluster
  //   VACUUM t [RETAIN <n> VERSIONS]         → VersionedTable.vacuum
  private val OptimizeRe =
    """(?is)\s*OPTIMIZE\s+([\w.]+)(?:\s+TARGET\s+(\d+))?(?:\s+ZORDER\s+BY\s*\(([^)]+)\))?\s*""".r
  private val VacuumRe =
    """(?is)\s*VACUUM\s+([\w.]+)(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?\s*""".r

  private def maintenanceStatement(spark: SparkSession, sql: String,
      tables: Map[String, String]): Option[Int] = sql match {
    case OptimizeRe(name, target, zorder) =>
      val root = rootOf(tables, name)
      Some(Option(zorder) match {
        case Some(cols) =>
          require(target == null, "TARGET applies to compaction, not ZORDER")
          VersionedTable.cluster(spark, root,
            cols.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        case None =>
          VersionedTable.compact(spark, root,
            Option(target).map(_.toLong).getOrElse(128L << 20))
      })
    case VacuumRe(name, retain) =>
      val root = rootOf(tables, name)
      VersionedTable.vacuum(spark, root,
        Option(retain).map(_.toInt).getOrElse(1))
      Some(VersionedTable.latestVersion(spark, root))
    case _ => None
  }

  /** The table NAME a routed statement targets, if the plan is one of the
    * statement shapes this router lowers — how the [[graft.plans]]
    * session-extension rule decides whether a `spark.sql` statement is the
    * engine's to execute. */
  private[graft] def statementTarget(plan: LogicalPlan): Option[String] =
    scala.util.Try(plan match {
      case UpdateTable(t, _, _) => Some(relOf(t).name)
      case DeleteFromTable(t, _) => Some(relOf(t).name)
      case m: MergeIntoTable => Some(relOf(m.targetTable).name)
      case i: InsertIntoStatement => Some(ddlName(i.table))
      case c: CreateTableAsSelect => Some(ddlName(c.name))
      case AddColumns(t, _) => Some(ddlName(t))
      case DropColumns(t, _, _) => Some(ddlName(t))
      case TruncateTable(t) => Some(ddlName(t))
      case AddCheckConstraint(t, _) => Some(ddlName(t))
      case DropConstraint(t, _, _, _) => Some(ddlName(t))
      case _ => None
    }).toOption.flatten

  /** Lower one parsed statement plan onto the verbs. */
  private[graft] def lower(spark: SparkSession, plan: LogicalPlan,
      tables: Map[String, String], sqlForError: String = ""): Int =
    plan match {
      case UpdateTable(target, assignments, condition) =>
        executeUpdate(spark, target, assignments, condition, tables)
      case DeleteFromTable(target, condition) =>
        executeDelete(spark, target, condition, tables)
      case m: MergeIntoTable => executeMerge(spark, m, tables)
      case i: InsertIntoStatement => executeInsert(spark, i, tables)
      case c: CreateTableAsSelect => executeCtas(spark, c, tables)
      case AddColumns(tbl, cols) => executeAddColumns(spark, tbl, cols, tables)
      case DropColumns(tbl, cols, ifExists) =>
        executeDropColumns(spark, tbl, cols, ifExists, tables)
      case TruncateTable(tbl) =>
        VersionedTable.deleteWhere(spark, rootOf(tables, ddlName(tbl)), lit(true))
      case AddCheckConstraint(tbl, c) =>
        val root = rootOf(tables, ddlName(tbl))
        VersionedTable.addConstraint(spark, root, c.userProvidedName, c.condition)
        VersionedTable.latestVersion(spark, root)
      case DropConstraint(tbl, name, ifExists, _) =>
        val root = rootOf(tables, ddlName(tbl))
        require(ifExists || VersionedTable.constraints(spark, root).exists(_._1 == name),
          s"no such constraint: $name")
        VersionedTable.dropConstraint(spark, root, name)
        VersionedTable.latestVersion(spark, root)
      case other => throw new IllegalArgumentException(
        s"not a DML statement (expected UPDATE/DELETE/MERGE/INSERT/CREATE TABLE AS/" +
          s"ALTER TABLE/TRUNCATE, parsed ${other.nodeName}): $sqlForError")
    }

  // ------------------------------------------------------------- resolution

  private def rootOf(tables: Map[String, String], name: String): String =
    tables.getOrElse(name, throw new IllegalArgumentException(
      s"unknown table '$name' (registered: ${tables.keys.toSeq.sorted.mkString(", ")})"))

  /** A statement's target/source relation: its dotted name plus the set of
    * qualifier spellings its expressions may use — the alias when one is
    * declared (which, as in SQL, then hides the table name), else the
    * table name itself. */
  private final case class Rel(name: String, quals: Set[String])

  private def relOf(plan: LogicalPlan): Rel = plan match {
    case SubqueryAlias(id, child) => Rel(relOf(child).name, Set(id.name.toLowerCase))
    case r: UnresolvedRelation =>
      val dotted = r.multipartIdentifier.mkString(".")
      Rel(dotted, Set(r.multipartIdentifier.last.toLowerCase, dotted.toLowerCase))
    case other => throw new IllegalArgumentException(
      s"unsupported DML target shape: ${other.nodeName}")
  }

  /** A bare relation name: the versioned table it maps to, else a session
    * view/table. */
  private def resolveRelation(spark: SparkSession, name: String,
      tables: Map[String, String]): DataFrame =
    tables.get(name).map(VersionedTable.read(spark, _))
      .getOrElse(spark.table(name))

  /** Run one SELECT statement against the registered versioned tables —
    * the read half of the statement surface. Names in `tables` resolve to
    * the table's CURRENT snapshot, or to a pinned older snapshot under
    * SQL's standard time-travel clause (`FROM t VERSION AS OF n` — the
    * still-vacuum-retained version n, exactly [[VersionedTable.read]]'s
    * contract); other names resolve as session views. */
  def query(spark: SparkSession, sql: String,
      tables: Map[String, String]): DataFrame =
    dataFrameOf(spark, spark.sessionState.sqlParser.parsePlan(sql), tables)

  /** Substitute every versioned-table name in a parsed sub-plan with the
    * (current or `VERSION AS OF`-pinned) snapshot's read, then analyze —
    * how an INSERT's SELECT, a MERGE subquery, or a [[query]] SELECT reads
    * the engine's own tables. Top-down so a time-travel wrapper claims its
    * inner relation before the bare-name rule would. */
  private def dataFrameOf(spark: SparkSession, plan: LogicalPlan,
      tables: Map[String, String]): DataFrame =
    bridge.ofRows(spark, substituteTables(spark, plan, tables))

  /** The substitution itself, usable on any plan fragment (also by the
    * session-extension resolution rule over plain `spark.sql` SELECTs). */
  private[graft] def substituteTables(spark: SparkSession, plan: LogicalPlan,
      tables: Map[String, String]): LogicalPlan =
    plan.transformDownWithSubqueries {
      case tt: RelationTimeTravel => tt.relation match {
        case r: UnresolvedRelation
            if tables.contains(r.multipartIdentifier.mkString(".")) =>
          require(tt.timestamp.isEmpty,
            "TIMESTAMP AS OF is not supported — versions are the table's clock; use VERSION AS OF")
          val v = tt.version.getOrElse(throw new IllegalArgumentException(
            "VERSION AS OF needs an integer version"))
          bridge.plan(VersionedTable.read(spark,
            tables(r.multipartIdentifier.mkString(".")), Some(v.toInt)))
        case _ => tt // not ours — leave for the session catalog
      }
      case r: UnresolvedRelation
          if tables.contains(r.multipartIdentifier.mkString(".")) =>
        bridge.plan(VersionedTable.read(spark,
          tables(r.multipartIdentifier.mkString("."))))
      // the CDC feed as a table-valued function, the lakehouse-format SQL
      // shape: table_changes('t', fromV, toV, 'key1[,key2…]') — the key
      // list is explicit because the feed is a keyed state diff
      case tvf: UnresolvedTableValuedFunction
          if tvf.name.length == 1 &&
            tvf.name.head.equalsIgnoreCase("table_changes") &&
            tvf.functionArgs.headOption.exists {
              case Literal(v, _) => v != null && tables.contains(v.toString)
              case _ => false
            } =>
        require(tvf.functionArgs.length == 4,
          "table_changes needs (table, fromVersion, toVersion, 'key1[,key2…]')")
        val Seq(Literal(t, _), Literal(fromV, _), Literal(toV, _), Literal(ks, _)) =
          tvf.functionArgs
        bridge.plan(VersionedTable.changes(spark, tables(t.toString),
          fromV.toString.toInt, toV.toString.toInt,
          ks.toString.split(",").map(_.trim).filter(_.nonEmpty).toSeq))
    }

  // ----------------------------------------------------------- expressions

  /** Rewrite alias qualifiers in a parsed (unresolved) expression:
    * qualifiers in `bareQuals` strip to the bare column (the side whose
    * rows the expression runs over), qualifiers in `srcQuals` become the
    * [[Dml.src]] `__src_` reference; any other qualifier fails loudly.
    * Unqualified names pass through. */
  private def rewriteExpr(e: Expression, bareQuals: Set[String],
      srcQuals: Set[String]): Column =
    bridge.column(e.transformUp {
      case a: UnresolvedAttribute if a.nameParts.length >= 2 =>
        val q = a.nameParts.init.mkString(".").toLowerCase
        if (bareQuals(q)) UnresolvedAttribute(Seq(a.nameParts.last))
        else if (srcQuals(q)) UnresolvedAttribute(Seq(s"__src_${a.nameParts.last}"))
        else throw new IllegalArgumentException(
          s"unknown or disallowed qualifier '${a.nameParts.init.mkString(".")}' in: ${e.sql}")
    })

  private def condColumn(cond: Option[Expression], bareQuals: Set[String],
      srcQuals: Set[String]): Column =
    cond.map(rewriteExpr(_, bareQuals, srcQuals)).getOrElse(lit(true))

  /** An assignment's target column name — a bare or target-qualified
    * attribute; nested fields are out of the verbs' contract. */
  private def assignName(key: Expression, tgtQuals: Set[String]): String = key match {
    case a: UnresolvedAttribute if a.nameParts.length == 1 => a.nameParts.head
    case a: UnresolvedAttribute if a.nameParts.length == 2 &&
        tgtQuals(a.nameParts.head.toLowerCase) => a.nameParts(1)
    case other => throw new IllegalArgumentException(
      s"unsupported assignment target (nested fields are not supported): ${other.sql}")
  }

  private def assignMap(assignments: Seq[Assignment], tgtQuals: Set[String],
      srcQuals: Set[String]): Map[String, Column] =
    assignments.map { case Assignment(k, v) =>
      assignName(k, tgtQuals) -> rewriteExpr(v, tgtQuals, srcQuals)
    }.toMap

  private def onConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => onConjuncts(l) ++ onConjuncts(r)
    case x => Seq(x)
  }

  /** Some(keyName) iff `e` is a same-named equi-key ACROSS the two
    * relations — one target qualifier + one source qualifier, a bare side
    * standing in for either. Both-sides-same-relation is NOT a key (ADVICE
    * r15: `ON t.k = t.k` is a non-join predicate, and silently
    * reinterpreting it as the equi-key `t.k = src.k` matches different
    * rows than SQL dictates); an unknown qualifier is not a key either. */
  private def equiKeyOf(e: Expression, tgtQuals: Set[String],
      srcQuals: Set[String]): Option[String] = e match {
    case EqualTo(l, r) =>
      def side(x: Expression): Option[(Option[String], String)] = x match {
        case a: UnresolvedAttribute if a.nameParts.length == 1 =>
          Some((None, a.nameParts.head))
        case a: UnresolvedAttribute if a.nameParts.length >= 2 =>
          Some((Some(a.nameParts.init.mkString(".").toLowerCase), a.nameParts.last))
        case _ => None
      }
      // 'T' target, 'S' source, 'B' bare, 'X' unknown qualifier
      def rel(q: Option[String]): Char = q match {
        case None => 'B'
        case Some(x) if tgtQuals(x) => 'T'
        case Some(x) if srcQuals(x) => 'S'
        case _ => 'X'
      }
      (side(l), side(r)) match {
        case (Some((ql, nl)), Some((qr, nr))) if nl.equalsIgnoreCase(nr) =>
          (rel(ql), rel(qr)) match {
            case ('X', _) | (_, 'X') => None
            case (a, b) if a == b && a != 'B' => None
            case _ => Some(nl)
          }
        case _ => None
      }
    case _ => None
  }

  /** The ON condition's conjuncts → the merge keys they name. The verb's
    * contract is same-named equi-keys; both `ta.k = sa.k` orders are
    * accepted, as is bare `k = k`. */
  private def keysOf(cond: Expression, tgtQuals: Set[String],
      srcQuals: Set[String]): Seq[String] =
    onConjuncts(cond).map {
      case eq: EqualTo => equiKeyOf(eq, tgtQuals, srcQuals).getOrElse(
        throw new IllegalArgumentException(
          s"MERGE ON conjunct must be a same-named equi-key across the two " +
            s"relations (ta.k = sa.k): ${cond.sql}"))
      case c => throw new IllegalArgumentException(
        s"MERGE ON conjunct must be an equality: ${c.sql}")
    }

  // ------------------------------------------------------------ statements

  private def executeDelete(spark: SparkSession, target: LogicalPlan,
      condition: Expression, tables: Map[String, String]): Int = {
    val rel = relOf(target)
    val root = rootOf(tables, rel.name)
    VersionedTable.deleteWhere(spark, root,
      rewriteExpr(condition, rel.quals, Set.empty))
  }

  private def executeUpdate(spark: SparkSession, target: LogicalPlan,
      assignments: Seq[Assignment], condition: Option[Expression],
      tables: Map[String, String]): Int = {
    val rel = relOf(target)
    val root = rootOf(tables, rel.name)
    val assigns = assignMap(assignments, rel.quals, Set.empty)
    val pred = condColumn(condition, rel.quals, Set.empty)
    // an assignment touching a partition column is a row MOVE — route to
    // the verb built for it instead of failing updateWhere's contract check
    val parts = VersionedTable.partitionColumns(spark, root).toSet
    if (assigns.keySet.exists(parts))
      VersionedTable.updateMove(spark, root, pred, assigns)
    else VersionedTable.updateWhere(spark, root, pred, assigns)
  }

  private def executeMerge(spark: SparkSession, m: MergeIntoTable,
      tables: Map[String, String]): Int = {
    require(!m.withSchemaEvolution,
      "MERGE … WITH SCHEMA EVOLUTION is not supported — evolve() first")
    val tgt = relOf(m.targetTable)
    val root = rootOf(tables, tgt.name)
    val (source, srcQuals) = m.sourceTable match {
      case SubqueryAlias(id, r: UnresolvedRelation) =>
        (resolveRelation(spark, r.multipartIdentifier.mkString("."), tables),
          Set(id.name.toLowerCase))
      case r: UnresolvedRelation =>
        val dotted = r.multipartIdentifier.mkString(".")
        (resolveRelation(spark, dotted, tables),
          Set(r.multipartIdentifier.last.toLowerCase, dotted.toLowerCase))
      case SubqueryAlias(id, sub) =>
        (dataFrameOf(spark, sub, tables), Set(id.name.toLowerCase))
      case sub => (dataFrameOf(spark, sub, tables), Set.empty[String])
    }
    val keys = keysOf(m.mergeCondition, tgt.quals, srcQuals)

    val targetCols = VersionedTable.read(spark, root).columns.toSeq
    val matched: Seq[Dml.MergeClause] = m.matchedActions.map {
      case d: DeleteAction =>
        Dml.WhenMatchedDelete(condColumn(d.condition, tgt.quals, srcQuals))
      case u: UpdateStarAction =>
        // UPDATE SET * — every target column takes the same-named source
        // column, the star form of an identity assignment list
        Dml.WhenMatchedUpdate(condColumn(u.condition, tgt.quals, srcQuals),
          targetCols.map(c => c -> Dml.src(c)).toMap)
      case u: UpdateAction =>
        Dml.WhenMatchedUpdate(condColumn(u.condition, tgt.quals, srcQuals),
          assignMap(u.assignments, tgt.quals, srcQuals))
      case other => throw new IllegalArgumentException(
        s"unsupported WHEN MATCHED action: ${other.getClass.getSimpleName}")
    }

    require(m.notMatchedActions.length <= 1, "at most one WHEN NOT MATCHED clause")
    // NOT MATCHED clauses run over SOURCE rows: source qualifiers strip to
    // the bare source column, target qualifiers are meaningless there
    val notMatched: Option[Column] = m.notMatchedActions.headOption.map {
      case ins: InsertStarAction => condColumn(ins.condition, srcQuals, Set.empty)
      case ins: InsertAction =>
        val listed = ins.assignments.map { case Assignment(k, v) =>
          val colName = assignName(k, srcQuals ++ tgt.quals)
          val srcName = v match {
            case a: UnresolvedAttribute if a.nameParts.length == 1 => Some(a.nameParts.head)
            case a: UnresolvedAttribute if a.nameParts.length >= 2 &&
                srcQuals(a.nameParts.init.mkString(".").toLowerCase) =>
              Some(a.nameParts.last)
            case _ => None
          }
          require(srcName.exists(_.equalsIgnoreCase(colName)),
            s"only identity INSERT is supported — each VALUES item must be " +
              s"the same-named source column (got $colName = ${v.sql}); " +
              s"project the USING subquery instead")
          require(source.columns.exists(_.equalsIgnoreCase(colName)),
            s"INSERT names a column absent from the source: $colName")
          colName.toLowerCase
        }.toSet
        // the verb inserts the FULL source row by name, so a column list
        // that skips table columns would NOT null-fill them as SQL demands
        // (ADVICE r15: unlisted columns silently took the source's values).
        // Reject the partial list loudly; a source that genuinely lacks
        // columns projects the USING subquery with explicit NULLs.
        val uncovered = targetCols.filterNot(c => listed(c.toLowerCase))
        require(uncovered.isEmpty,
          s"WHEN NOT MATCHED INSERT column list must cover every table " +
            s"column (missing: ${uncovered.mkString(", ")}) — the verb " +
            s"inserts full source rows; project the USING subquery with " +
            s"explicit NULLs for SQL's null-fill")
        condColumn(ins.condition, srcQuals, Set.empty)
      case other => throw new IllegalArgumentException(
        s"unsupported WHEN NOT MATCHED action: ${other.getClass.getSimpleName}")
    }

    // NOT MATCHED BY SOURCE clauses run over source-unmatched TARGET rows:
    // target columns only — a source reference has no row to read
    val notMatchedBySource: Seq[Dml.MergeClause] = m.notMatchedBySourceActions.map {
      case d: DeleteAction =>
        Dml.WhenMatchedDelete(condColumn(d.condition, tgt.quals, Set.empty))
      case u: UpdateAction =>
        Dml.WhenMatchedUpdate(condColumn(u.condition, tgt.quals, Set.empty),
          assignMap(u.assignments, tgt.quals, Set.empty))
      case other => throw new IllegalArgumentException(
        s"unsupported WHEN NOT MATCHED BY SOURCE action: ${other.getClass.getSimpleName}")
    }

    VersionedTable.mergeClauses(spark, root, source, keys, matched, notMatched,
      VersionedTable.partitionColumns(spark, root), notMatchedBySource)
  }

  private def executeInsert(spark: SparkSession, i: InsertIntoStatement,
      tables: Map[String, String]): Int = {
    val rel = relOf(i.table)
    val root = rootOf(tables, rel.name)
    require(i.partitionSpec.isEmpty && !i.ifPartitionNotExists,
      "static PARTITION clauses are not supported — rows route by the table's own layout")
    val q = dataFrameOf(spark, i.query, tables)
    val mapped =
      if (i.userSpecifiedCols.nonEmpty) {
        require(q.columns.length == i.userSpecifiedCols.length,
          s"INSERT column list names ${i.userSpecifiedCols.length} columns " +
            s"but the query produces ${q.columns.length}")
        q.toDF(i.userSpecifiedCols: _*)
      } else if (i.byName) q
      else {
        val tableCols = VersionedTable.read(spark, root).columns.toSeq
        require(q.columns.length == tableCols.length,
          s"positional INSERT needs ${tableCols.length} columns " +
            s"(table ${rel.name}), got ${q.columns.length}")
        q.toDF(tableCols: _*)
      }
    VersionedTable.insertInto(spark, root, mapped, overwrite = i.overwrite)
  }

  // ------------------------------------------------------------------- DDL
  // The table-lifecycle statements, routed to the versioned table's
  // lifecycle verbs: CREATE TABLE … AS SELECT → create (zero-rewrite),
  // ALTER TABLE ADD COLUMNS → evolve (one schema-log entry, no data
  // rewrite), ALTER TABLE DROP COLUMN(S) → dropColumns (tombstoned,
  // zero-rewrite), TRUNCATE → deleteWhere(true), ADD/DROP CONSTRAINT →
  // the CHECK-constraint log. DDL statements name their table through
  // `UnresolvedTable`/`UnresolvedIdentifier` rather than a relation.

  /** The dotted table name of a DDL statement's target. `ADD CONSTRAINT`
    * parses its table wrapped in a validation `Filter` (the analyzer would
    * resolve the CHECK expression through it), so a unary wrapper descends
    * to its child. */
  private def ddlName(plan: LogicalPlan): String = plan match {
    case t: UnresolvedTable => t.multipartIdentifier.mkString(".")
    case i: UnresolvedIdentifier => i.nameParts.mkString(".")
    case r: UnresolvedRelation => r.multipartIdentifier.mkString(".")
    case other if other.children.length == 1 => ddlName(other.children.head)
    case other => throw new IllegalArgumentException(
      s"unsupported DDL target shape: ${other.nodeName}")
  }

  /** `CREATE TABLE [IF NOT EXISTS] name [PARTITIONED BY (cols)] AS SELECT`
    * → [[VersionedTable.create]] at the root the caller's `tables` map
    * assigns to `name` (the map IS the catalog: where tables live is the
    * caller's decision, as with every other statement here). */
  private def executeCtas(spark: SparkSession, c: CreateTableAsSelect,
      tables: Map[String, String]): Int = {
    val root = rootOf(tables, ddlName(c.name))
    val partCols = c.partitioning.map { tr: Transform =>
      // the concrete transform classes are private[sql]; the public
      // connector interface identifies the identity transform by name
      require(tr.name == "identity",
        s"only identity PARTITIONED BY columns are supported: ${tr.describe}")
      val refs = tr.references
      require(refs.length == 1 && refs.head.fieldNames.length == 1,
        s"nested partition references are not supported: ${tr.describe}")
      refs.head.fieldNames.head
    }
    val exists = scala.util.Try(VersionedTable.latestVersion(spark, root)).toOption
    exists match {
      case Some(v) =>
        require(c.ignoreIfExists,
          s"table '${ddlName(c.name)}' already exists (at $root)")
        v
      case None =>
        val df = dataFrameOf(spark, c.query, tables)
        VersionedTable.create(spark, root,
          if (partCols.nonEmpty) df.repartition(partCols.map(col): _*) else df,
          partCols)
    }
  }

  /** `ALTER TABLE t ADD COLUMNS (…)` → [[VersionedTable.evolve]]. Nested
    * fields, positions (`FIRST`/`AFTER`) and defaults are outside the
    * verb's contract and fail loudly. */
  private def executeAddColumns(spark: SparkSession, tbl: LogicalPlan,
      cols: Seq[QualifiedColType], tables: Map[String, String]): Int = {
    val root = rootOf(tables, ddlName(tbl))
    val fields = cols.map { c =>
      require(c.path.isEmpty, s"nested ADD COLUMNS is not supported: ${c.colName}")
      require(c.position.isEmpty,
        s"column positions (FIRST/AFTER) are not supported: ${c.colName}")
      require(c.default.isEmpty,
        s"column DEFAULTs are not supported (existing rows null-fill): ${c.colName}")
      StructField(c.colName, c.dataType, c.nullable)
    }
    VersionedTable.evolve(spark, root, StructType(fields))
  }

  /** `ALTER TABLE t DROP COLUMN[S] [IF EXISTS] …` →
    * [[VersionedTable.dropColumns]]; with `IF EXISTS` missing names are
    * skipped, and dropping nothing commits nothing. */
  private def executeDropColumns(spark: SparkSession, tbl: LogicalPlan,
      cols: Seq[FieldName], ifExists: Boolean,
      tables: Map[String, String]): Int = {
    val root = rootOf(tables, ddlName(tbl))
    val names = cols.map { f =>
      require(f.name.length == 1, s"nested DROP COLUMN is not supported: ${f.name.mkString(".")}")
      f.name.head
    }
    val toDrop =
      if (!ifExists) names
      else {
        val present = VersionedTable.read(spark, root).columns.toSet
        names.filter(present)
      }
    if (toDrop.isEmpty) VersionedTable.latestVersion(spark, root)
    else VersionedTable.dropColumns(spark, root, toDrop)
  }

  // ---------------------------------------------------------------- gates

  import java.nio.file.Files

  /** SQL DELETE, gated like `sink_delete_where` (same oracle): the events
    * feed committed as a versioned table, the user-range delete issued as
    * a SQL string, survivors aggregated. */
  private def sqlDeleteWhere(s: SparkSession, dir: String): DataFrame = {
    val root = Files.createTempDirectory("graft_sqldel_").toString + "/t"
    val events = graft.streaming.EventOps.events(s, dir)
      .withColumn("ubucket", expr("user_id div 50"))
    VersionedTable.create(s, root, events.repartition(col("ubucket")), Seq("ubucket"))
    require(execute(s, "DELETE FROM events WHERE user_id BETWEEN 30 AND 60",
      Map("events" -> root)) == 2, "the SQL DELETE must commit as v2")
    VersionedTable.read(s, root)
      .agg(count(lit(1)).as("n_events"),
        count_distinct(col("user_id")).as("n_users"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("value_cents"))
  }

  /** SQL UPDATE, gated like `sink_update_where` (same oracle): every 9th
    * user's value doubled through the SQL string. */
  private def sqlUpdateWhere(s: SparkSession, dir: String): DataFrame = {
    val root = Files.createTempDirectory("graft_sqlupd_").toString + "/t"
    val events = graft.streaming.EventOps.events(s, dir)
      .withColumn("ubucket", expr("user_id div 50"))
    VersionedTable.create(s, root, events.repartition(col("ubucket")), Seq("ubucket"))
    require(execute(s, "UPDATE events SET value = value * 2 WHERE user_id % 9 = 0",
      Map("events" -> root)) == 2, "the SQL UPDATE must commit as v2")
    VersionedTable.read(s, root)
      .agg(count(lit(1)).as("n_events"),
        count_distinct(col("user_id")).as("n_users"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("value_cents"))
  }

  /** SQL MERGE with ordered clauses, gated like `sink_merge_into` (same
    * oracle): price updates (every 4th code, +5.00) and re-keyed inserts
    * (every 10th code) land through one MERGE statement whose source is a
    * session view — matched rows take the source price/category, unmatched
    * source rows INSERT *. */
  private def sqlMergeInto(s: SparkSession, dir: String): DataFrame = {
    val root = Files.createTempDirectory("graft_sqlmrg_").toString + "/t"
    val code = col("stockcode").cast("long")
    val p = graft.etl.Warehouse(s, dir).dimProduct
      .select(col("stockcode"), col("unitprice"), col("category"))
      .withColumn("pbucket", expr("CAST(stockcode AS BIGINT) div 500"))
    VersionedTable.create(s, root, p.repartition(col("pbucket")), Seq("pbucket"))
    val changed = p.filter(code % 4 === 0)
      .withColumn("unitprice",
        (col("unitprice") + lit(BigDecimal("5.00"))).cast("decimal(12,2)"))
    val inserts = p.filter(code % 10 === 0)
      .select((code + 100000).cast("string").as("stockcode"),
        col("unitprice"), lit("New").as("category"))
      .withColumn("pbucket", expr("CAST(stockcode AS BIGINT) div 500"))
    changed.unionByName(inserts).createOrReplaceTempView("sql_merge_src")
    require(execute(s, """
      MERGE INTO products AS t USING sql_merge_src AS u
      ON t.stockcode = u.stockcode
      WHEN MATCHED THEN UPDATE SET unitprice = u.unitprice, category = u.category
      WHEN NOT MATCHED THEN INSERT *""",
      Map("products" -> root)) == 2, "the SQL MERGE must commit as v2")
    VersionedTable.read(s, root)
      .select(col("stockcode"), col("unitprice").cast("double").as("unitprice"),
        col("category"))
  }

  /** Postgres-form `UPDATE … FROM` (r16): the reference's own join
    * price-repair statement (`Iteration 1/Group No.6_ETL.sql:178-181`) run
    * verbatim-shaped against the versioned table — a sales-like target with
    * every 3rd price NULLed and every remaining 5th negated, repaired from
    * the products source through ONE `UPDATE … FROM` string. The oracle
    * spells the repair's exact semantics: NULL prices take the source's,
    * non-positive prices keep themselves (the statement's own COALESCE
    * quirk, reproduced faithfully), everything else untouched. */
  private def sqlUpdateFrom(s: SparkSession, dir: String): DataFrame = {
    val root = Files.createTempDirectory("graft_sqluf_").toString + "/t"
    val code = col("stockcode").cast("long")
    val p = graft.etl.Warehouse(s, dir).dimProduct
      .select(col("stockcode"), col("unitprice"), col("category"))
    val target = p.withColumn("unitprice",
      when(code % 3 === 0, lit(null).cast("decimal(12,2)"))
        .when(code % 5 === 0, (-col("unitprice")).cast("decimal(12,2)"))
        .otherwise(col("unitprice")))
    VersionedTable.create(s, root, target.repartition(4))
    p.createOrReplaceTempView("graft_uf_products")
    require(execute(s, """
      UPDATE sales sc
      SET unitprice = COALESCE(sc.unitprice, pc.unitprice)
      FROM graft_uf_products pc
      WHERE sc.stockcode = pc.stockcode
        AND (sc.unitprice IS NULL OR sc.unitprice <= 0)""",
      Map("sales" -> root)) == 2, "the UPDATE…FROM must commit as v2")
    VersionedTable.read(s, root)
      .select(col("stockcode"), col("unitprice").cast("double").as("unitprice"),
        col("category"))
  }

  /** SQL INSERT lifecycle (r15): a positional `INSERT INTO … SELECT` that
    * reads the very table it appends to (snapshot isolation — the SELECT
    * pins to the pre-commit version), a column-list `INSERT … VALUES` whose
    * unlisted column null-fills, then an `INSERT OVERWRITE … SELECT` full
    * replace — three statements, three committed versions, oracle over the
    * final state. */
  private def sqlInsertInto(s: SparkSession, dir: String): DataFrame = {
    val root = Files.createTempDirectory("graft_sqlins_").toString + "/t"
    val p = graft.etl.Warehouse(s, dir).dimProduct
      .select(col("stockcode"), col("unitprice"), col("category"))
    VersionedTable.create(s, root, p.repartition(4))
    val t = Map("products" -> root)
    require(execute(s, """
      INSERT INTO products
      SELECT CAST(CAST(stockcode AS BIGINT) + 600000 AS STRING), unitprice, category
      FROM products WHERE CAST(stockcode AS BIGINT) % 6 = 0""", t) == 2,
      "the self-referential INSERT…SELECT must commit as v2")
    require(execute(s,
      "INSERT INTO products (stockcode, unitprice) VALUES ('999991', 1.50), ('999992', 7.25)",
      t) == 3, "the column-list VALUES insert must commit as v3")
    require(execute(s,
      "INSERT OVERWRITE products SELECT * FROM products WHERE unitprice >= 1",
      t) == 4, "the overwrite must commit as v4")
    VersionedTable.read(s, root)
      .select(col("stockcode"), col("unitprice").cast("double").as("unitprice"),
        col("category"))
  }

  /** SQL MERGE sync-to-desired-state (r15): the `WHEN NOT MATCHED BY
    * SOURCE` surface plus `UPDATE SET *` through one statement. The source
    * is the desired state (every 3rd code re-priced +1.00, every 10th code
    * re-keyed as a new row); matched target rows take the whole source row
    * (star update), unmatched source rows insert, and source-unmatched
    * target rows are DELETED when cheap (&lt; 2) else MARKED stale when
    * &lt; 5 — ordered NMBS clauses, first true wins. */
  private def sqlMergeSync(s: SparkSession, dir: String): DataFrame = {
    val root = Files.createTempDirectory("graft_sqlsync_").toString + "/t"
    val code = col("stockcode").cast("long")
    val p = graft.etl.Warehouse(s, dir).dimProduct
      .select(col("stockcode"), col("unitprice"), col("category"))
    VersionedTable.create(s, root, p.repartition(4))
    val desired = p.filter(code % 3 === 0)
      .withColumn("unitprice",
        (col("unitprice") + lit(BigDecimal("1.00"))).cast("decimal(12,2)"))
      .unionByName(p.filter(code % 10 === 0)
        .select((code + 400000).cast("string").as("stockcode"),
          (col("unitprice") + lit(BigDecimal("1.00"))).cast("decimal(12,2)").as("unitprice"),
          lit("Synced").as("category")))
    desired.createOrReplaceTempView("graft_sql_sync_src")
    require(execute(s, """
      MERGE INTO products AS t USING graft_sql_sync_src AS u
      ON t.stockcode = u.stockcode
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *
      WHEN NOT MATCHED BY SOURCE AND t.unitprice < 2 THEN DELETE
      WHEN NOT MATCHED BY SOURCE AND t.unitprice < 5 THEN UPDATE SET category = 'Stale'""",
      Map("products" -> root)) == 2, "the sync MERGE must commit as v2")
    VersionedTable.read(s, root)
      .select(col("stockcode"), col("unitprice").cast("double").as("unitprice"),
        col("category"))
  }

  /** SQL DDL lifecycle (r15): the whole table lifecycle driven by SQL
    * statements — a partitioned CTAS reading a registered table, an
    * IF-NOT-EXISTS no-op, zero-rewrite ADD COLUMNS, a SQL UPDATE backfill
    * of the new column, a CHECK constraint that REJECTS a violating SQL
    * INSERT then admits a valid one, constraint drop, and a zero-rewrite
    * DROP COLUMNS with IF EXISTS skipping a missing name. Oracle over the
    * final evolved state. */
  private def sqlDdlLifecycle(s: SparkSession, dir: String): DataFrame = {
    val rootP = Files.createTempDirectory("graft_sqlddl_p_").toString + "/t"
    val rootW = Files.createTempDirectory("graft_sqlddl_w_").toString + "/t"
    val p = graft.etl.Warehouse(s, dir).dimProduct
      .select(col("stockcode"), col("unitprice"), col("category"))
    VersionedTable.create(s, rootP, p.repartition(4))
    val t = Map("products" -> rootP, "wide" -> rootW)
    require(execute(s, """
      CREATE TABLE wide PARTITIONED BY (pbucket) AS
      SELECT stockcode, unitprice, category,
             CAST(stockcode AS BIGINT) div 500 AS pbucket
      FROM products""", t) == 1, "CTAS must commit as v1")
    require(execute(s,
      "CREATE TABLE IF NOT EXISTS wide AS SELECT * FROM products", t) == 1,
      "IF NOT EXISTS on an existing table must be a no-op at v1")
    require(execute(s,
      "ALTER TABLE wide ADD COLUMNS (tier STRING, scratch INT)", t) == 2,
      "the evolution must commit as v2")
    require(execute(s, """
      UPDATE wide SET tier = CASE WHEN unitprice >= 10 THEN 'premium'
                                  ELSE 'basic' END""", t) == 3,
      "the backfill must commit as v3")
    require(execute(s,
      "ALTER TABLE wide ADD CONSTRAINT tier_set CHECK (tier IN ('premium', 'basic'))",
      t) == 3, "the constraint registers against the current head, committing nothing")
    val violated =
      try {
        execute(s, """
          INSERT INTO wide (stockcode, unitprice, category, pbucket, tier)
          VALUES ('777772', 2.00, 'Bad', 1555, 'luxury')""", t)
        false
      } catch {
        case e: IllegalStateException => e.getMessage.contains("CHECK constraint")
      }
    require(violated, "a violating SQL INSERT must fail the CHECK constraint")
    require(execute(s, """
      INSERT INTO wide (stockcode, unitprice, category, pbucket, tier)
      VALUES ('777771', 3.00, 'Extra', 1555, 'basic')""", t) == 4,
      "the valid insert must commit as v4")
    require(execute(s, "ALTER TABLE wide DROP CONSTRAINT tier_set", t) == 4,
      "dropping the constraint commits nothing")
    require(execute(s,
      "ALTER TABLE wide DROP COLUMNS IF EXISTS (scratch, ghost)", t) == 5,
      "the column drop must commit as v5, skipping the missing name")
    VersionedTable.read(s, rootW)
      .select(col("stockcode"), col("unitprice").cast("double").as("unitprice"),
        col("category"), col("tier"))
  }

  /** SQL time travel (r15): one SELECT reading BOTH a pinned older
    * snapshot (`VERSION AS OF 1` — the pre-DML state, SQL's standard
    * clause) and the mutated head, union-tagged. A stale pin (serving the
    * head at v1), a leaked update into v1, or a lost head update all
    * hash-mismatch against the oracle's two spelled states. */
  private def sqlTimeTravel(s: SparkSession, dir: String): DataFrame = {
    val root = Files.createTempDirectory("graft_sqltt_").toString + "/t"
    val p = graft.etl.Warehouse(s, dir).dimProduct
      .select(col("stockcode"), col("unitprice"), col("category"))
    VersionedTable.create(s, root, p.repartition(4))
    val t = Map("products" -> root)
    require(execute(s,
      "UPDATE products SET unitprice = unitprice * 2 WHERE CAST(stockcode AS BIGINT) % 4 = 0",
      t) == 2, "the update must commit as v2")
    query(s, """
      SELECT 'v1' AS at_version, stockcode,
             CAST(unitprice AS DOUBLE) AS unitprice, category
      FROM products VERSION AS OF 1
      UNION ALL
      SELECT 'head' AS at_version, stockcode,
             CAST(unitprice AS DOUBLE) AS unitprice, category
      FROM products""", t)
  }

  /** The `spark.sql` session integration (r15), gated like
    * `sql_update_where` (same oracle): with [[graft.plans.GraftExtensions]]
    * on the session and the table registered in [[GraftCatalog]], the
    * UPDATE runs as a plain `spark.sql(...)` command (returning the
    * committed version as its result row) and the final aggregate is a
    * plain `spark.sql` SELECT over the registered name — no router entry
    * point in sight, the deployment-shaped path. */
  private def sqlSessionSurface(s: SparkSession, dir: String): DataFrame = {
    val root = Files.createTempDirectory("graft_sqlsess_g_").toString + "/t"
    val events = graft.streaming.EventOps.events(s, dir)
      .withColumn("ubucket", expr("user_id div 50"))
    VersionedTable.create(s, root, events.repartition(col("ubucket")), Seq("ubucket"))
    val s2 = GraftSqlSession.forBase(s)
    GraftCatalog.register("events_sess", root)
    try {
      require(s2.sql(
        "UPDATE events_sess SET value = value * 2 WHERE user_id % 9 = 0")
        .head().getInt(0) == 2, "the spark.sql UPDATE must commit as v2")
      s2.sql("""
        SELECT count(1) AS n_events, count(DISTINCT user_id) AS n_users,
               sum(CAST(round(value * 100) AS BIGINT)) AS value_cents
        FROM events_sess""")
    } finally GraftCatalog.unregister("events_sess")
  }

  /** SQL maintenance statements (r15): a deliberately fragmented table
    * compacted by `OPTIMIZE`, z-ordered by `OPTIMIZE … ZORDER BY`, then
    * history-trimmed by `VACUUM … RETAIN 2 VERSIONS` — all through SQL
    * strings, with the gate REQUIRING the file count to actually drop,
    * the vacuumed version to actually die, and (the maintenance
    * invariant) the final rows byte-for-byte the original identity:
    * maintenance moves bytes, never rows. */
  private def sqlOptimizeVacuum(s: SparkSession, dir: String): DataFrame = {
    val root = Files.createTempDirectory("graft_sqlopt_").toString + "/t"
    val p = graft.etl.Warehouse(s, dir).dimProduct
      .select(col("stockcode"), col("unitprice"), col("category"))
    VersionedTable.create(s, root, p.repartition(32))
    val t = Map("products" -> root)
    def fileCount(v: Int): Long =
      VersionedTable.listSnapshotFiles(s, root, v).count()
    require(execute(s, "OPTIMIZE products TARGET 268435456", t) == 2,
      "the compaction must commit as v2")
    require(fileCount(2) < fileCount(1),
      s"OPTIMIZE must shrink the file count (${fileCount(1)} -> ${fileCount(2)})")
    require(execute(s, "OPTIMIZE products ZORDER BY (stockcode)", t) == 3,
      "the clustering must commit as v3")
    require(execute(s, "VACUUM products RETAIN 2 VERSIONS", t) == 3,
      "VACUUM reports the surviving head")
    require(scala.util.Try(VersionedTable.read(s, root, Some(1)).count()).isFailure,
      "v1 must be vacuumed away")
    require(scala.util.Try(VersionedTable.read(s, root, Some(2)).count()).isSuccess,
      "v2 is within the retained depth")
    VersionedTable.read(s, root)
      .select(col("stockcode"), col("unitprice").cast("double").as("unitprice"),
        col("category"))
  }

  /** CDC through SQL (r15): after a SQL UPDATE, the v1→v2 change feed is
    * read back as the `table_changes` table-valued function inside a plain
    * SELECT — the lakehouse-format CDC shape. The oracle spells the exact
    * pre/post image pairs, so a leaked unchanged row, a missing image, or
    * a wrong change class hash-mismatches. */
  private def sqlTableChanges(s: SparkSession, dir: String): DataFrame = {
    val root = Files.createTempDirectory("graft_sqltc_").toString + "/t"
    val p = graft.etl.Warehouse(s, dir).dimProduct
      .select(col("stockcode"), col("unitprice"), col("category"))
    VersionedTable.create(s, root, p.repartition(4))
    val t = Map("products" -> root)
    require(execute(s,
      "UPDATE products SET unitprice = unitprice * 2 WHERE CAST(stockcode AS BIGINT) % 4 = 0",
      t) == 2, "the update must commit as v2")
    query(s, """
      SELECT stockcode, change_type,
             CAST(unitprice AS DOUBLE) AS unitprice, category
      FROM table_changes('products', 1, 2, 'stockcode')""", t)
  }

  /** Oracles are SHARED with the DSL rows they mirror — looked up from the
    * registry so the SQL and DSL surfaces can never drift apart. */
  private def sinkOracle(name: String): String =
    SinkQueries.defs.find(_.name == name).get.oracle.get

  def defs: Seq[graft.QueryDef] = Seq(
    graft.QueryDef("sql_delete_where", sqlDeleteWhere,
      Some(sinkOracle("sink_delete_where"))),
    graft.QueryDef("sql_update_where", sqlUpdateWhere,
      Some(sinkOracle("sink_update_where"))),
    graft.QueryDef("sql_merge_into", sqlMergeInto,
      Some(sinkOracle("sink_merge_into"))),
    graft.QueryDef("sql_update_from", sqlUpdateFrom,
      Some(graft.oracle.OracleSql.q("""
      , uf AS (SELECT stockcode, unitprice, category,
                      CAST(stockcode AS BIGINT) AS code
               FROM dim_product)
      SELECT stockcode,
             CAST(CASE WHEN code % 3 = 0 THEN unitprice
                       WHEN code % 5 = 0 THEN -unitprice
                       ELSE unitprice END AS DOUBLE) AS unitprice,
             category
      FROM uf"""))),
    graft.QueryDef("sql_insert_into", sqlInsertInto,
      Some(graft.oracle.OracleSql.q("""
      , ins AS (
          SELECT stockcode, unitprice, category FROM dim_product
          UNION ALL
          SELECT CAST(CAST(stockcode AS BIGINT) + 600000 AS VARCHAR) AS stockcode,
                 unitprice, category
          FROM dim_product WHERE CAST(stockcode AS BIGINT) % 6 = 0
          UNION ALL
          SELECT '999991' AS stockcode, CAST(1.50 AS DECIMAL(12,2)) AS unitprice,
                 NULL AS category
          UNION ALL
          SELECT '999992' AS stockcode, CAST(7.25 AS DECIMAL(12,2)) AS unitprice,
                 NULL AS category)
      SELECT stockcode, CAST(unitprice AS DOUBLE) AS unitprice, category
      FROM ins WHERE unitprice >= 1"""))),
    graft.QueryDef("sql_merge_sync", sqlMergeSync,
      Some(graft.oracle.OracleSql.q("""
      , mt AS (SELECT stockcode, unitprice, category,
                      CAST(stockcode AS BIGINT) AS code
               FROM dim_product)
      SELECT stockcode,
             CAST(CASE WHEN code % 3 = 0 THEN unitprice + 1.00
                       ELSE unitprice END AS DOUBLE) AS unitprice,
             CASE WHEN code % 3 <> 0 AND unitprice < 5 THEN 'Stale'
                  ELSE category END AS category
      FROM mt
      WHERE code % 3 = 0 OR unitprice >= 2 OR unitprice IS NULL
      UNION ALL
      SELECT CAST(code + 400000 AS VARCHAR) AS stockcode,
             CAST(unitprice + 1.00 AS DOUBLE) AS unitprice,
             'Synced' AS category
      FROM mt WHERE code % 10 = 0"""))),
    graft.QueryDef("sql_ddl_lifecycle", sqlDdlLifecycle,
      Some(graft.oracle.OracleSql.q("""
      , ddl AS (
          SELECT stockcode, unitprice, category FROM dim_product
          UNION ALL
          SELECT '777771' AS stockcode, CAST(3.00 AS DECIMAL(12,2)) AS unitprice,
                 'Extra' AS category)
      SELECT stockcode, CAST(unitprice AS DOUBLE) AS unitprice, category,
             CASE WHEN unitprice >= 10 THEN 'premium' ELSE 'basic' END AS tier
      FROM ddl"""))),
    graft.QueryDef("sql_time_travel", sqlTimeTravel,
      Some(graft.oracle.OracleSql.q("""
      SELECT 'v1' AS at_version, stockcode,
             CAST(unitprice AS DOUBLE) AS unitprice, category
      FROM dim_product
      UNION ALL
      SELECT 'head' AS at_version, stockcode,
             CAST(CASE WHEN CAST(stockcode AS BIGINT) % 4 = 0
                       THEN unitprice * 2 ELSE unitprice END AS DOUBLE) AS unitprice,
             category
      FROM dim_product"""))),
    graft.QueryDef("sql_session_surface", sqlSessionSurface,
      Some(sinkOracle("sink_update_where"))),
    graft.QueryDef("sql_optimize_vacuum", sqlOptimizeVacuum,
      Some(graft.oracle.OracleSql.q("""
      SELECT stockcode, CAST(unitprice AS DOUBLE) AS unitprice, category
      FROM dim_product"""))),
    graft.QueryDef("sql_table_changes", sqlTableChanges,
      Some(graft.oracle.OracleSql.q("""
      , tc AS (SELECT stockcode, unitprice, category FROM dim_product
               WHERE CAST(stockcode AS BIGINT) % 4 = 0)
      SELECT stockcode, 'update_preimage' AS change_type,
             CAST(unitprice AS DOUBLE) AS unitprice, category
      FROM tc
      UNION ALL
      SELECT stockcode, 'update_postimage' AS change_type,
             CAST(unitprice * 2 AS DOUBLE) AS unitprice, category
      FROM tc"""))))
}
