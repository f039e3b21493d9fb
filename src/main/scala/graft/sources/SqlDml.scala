package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{EqualTo, Expression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.expressions.{column => toColumn}

/** SQL DML surface (r15, VERDICT r14 #2): `UPDATE` / `DELETE` / `MERGE`
  * statements routed to the versioned table's verbs — the way a warehouse
  * user actually reaches DML. The reference's own pipelines mutate through
  * SQL statements (`Iteration 1/Group No.6_ETL.sql:141-194` — `UPDATE
  * staging.products_clean SET …`, `UPDATE staging.sales_clean sc SET …
  * WHERE …`), and the engine's whole READ workload is already servable as
  * verbatim SQL ([[SqlSurface]]); this closes the write half, so every DML
  * capability — file-selective copy-on-write, constraint enforcement, CDC
  * feeds, commit listeners, auto-served MVs — is one SQL string away.
  *
  * Statement → verb routing (each returns the committed version):
  *  - `DELETE FROM t [WHERE p]`          → [[VersionedTable.deleteWhere]]
  *  - `UPDATE t [alias] SET a = e, … [WHERE p]`
  *      → [[VersionedTable.updateWhere]], or [[VersionedTable.updateMove]]
  *        automatically when an assignment touches a partition column (the
  *        row-move form `updateWhere` rejects by contract)
  *  - `MERGE INTO t [AS] ta USING src|(subquery) [AS] sa ON ta.k = sa.k [AND …]
  *     WHEN MATCHED [AND c] THEN UPDATE SET … | DELETE   (ordered)
  *     WHEN NOT MATCHED [AND c] THEN INSERT * | (cols) VALUES (sa.cols)`
  *      → [[VersionedTable.mergeClauses]] (partition columns auto-derived
  *        from the head snapshot's layout so inserts route correctly)
  *
  * Table names resolve through the caller's `tables` map (name →
  * versioned-table root) — the engine's catalog surface; a MERGE source
  * name not in the map resolves as a session view (`spark.table`), and a
  * parenthesized source runs as a subquery. Expressions are parsed by
  * Spark's OWN SQL parser (`parseExpression` — full function surface,
  * correct literal/quote semantics for free); this file only splits the
  * STATEMENT structure, with a quote/paren-aware scanner, and rewrites
  * alias qualifiers (`ta.c` → target column `c`, `sa.c` → the
  * [[Dml.src]] source reference a matched clause reads). Unqualified
  * columns in matched clauses are target columns, as in SQL MERGE.
  *
  * Deliberate bounds (each fails loudly, never silently re-interprets):
  * MERGE keys must be same-named equi-columns (the verb's contract);
  * `INSERT` must be the identity mapping (`*`, or every VALUES item the
  * same-named source column — project the source subquery for anything
  * else); one `WHEN NOT MATCHED` clause; no `UPDATE … FROM` (that join
  * shape IS `MERGE`).
  */
object SqlDml extends graft.QueryRegistry {

  /** Execute one DML statement against the versioned tables in `tables`
    * (logical name → table root). Returns the committed version. */
  def execute(spark: SparkSession, sql: String,
      tables: Map[String, String]): Int = {
    val c = new Cursor(sql)
    val v =
      if (c.tryKeywords("UPDATE")) executeUpdate(spark, c, tables)
      else if (c.tryKeywords("DELETE")) executeDelete(spark, c, tables)
      else if (c.tryKeywords("MERGE")) executeMerge(spark, c, tables)
      else throw new IllegalArgumentException(
        s"not a DML statement (expected UPDATE/DELETE/MERGE): ${sql.trim.take(60)}")
    v
  }

  // ------------------------------------------------------------ statements

  private def rootOf(tables: Map[String, String], name: String): String =
    tables.getOrElse(name, throw new IllegalArgumentException(
      s"unknown table '$name' (registered: ${tables.keys.toSeq.sorted.mkString(", ")})"))

  /** Partition columns of the head snapshot's directory layout. */
  private def partColsOf(spark: SparkSession, root: String): Seq[String] = {
    val latest = VersionedTable.latestVersion(spark, root)
    Compaction.listFiles(spark, VersionedTable.vDir(root, latest)).collect()
      .map(_.getAs[String]("part")).find(_ != ".").toSeq
      .flatMap(_.split("/").toSeq).map(_.split("=", 2)(0))
  }

  private def executeDelete(spark: SparkSession, c: Cursor,
      tables: Map[String, String]): Int = {
    c.expectKeywords("FROM")
    val root = rootOf(tables, c.ident())
    val alias = if (c.atKeyword("WHERE") || c.eof) None else Some(c.ident())
    val pred =
      if (c.tryKeywords("WHERE")) parseScalar(spark, c.rest(), alias, None)
      else lit(true)
    VersionedTable.deleteWhere(spark, root, pred)
  }

  private def executeUpdate(spark: SparkSession, c: Cursor,
      tables: Map[String, String]): Int = {
    val root = rootOf(tables, c.ident())
    val alias = if (c.atKeyword("SET")) None else Some(c.ident())
    c.expectKeywords("SET")
    val setText = c.until("WHERE")
    val pred =
      if (c.tryKeywords("WHERE")) parseScalar(spark, c.rest(), alias, None)
      else lit(true)
    val assigns = splitTopLevel(setText, ',').map { a =>
      val eq = topLevelIndexOf(a, '=')
      require(eq > 0, s"malformed assignment: $a")
      val target = stripQualifier(a.take(eq).trim, alias)
      target -> parseScalar(spark, a.drop(eq + 1), alias, None)
    }.toMap
    // an assignment touching a partition column is a row MOVE — route to
    // the verb built for it instead of failing updateWhere's contract check
    val parts = partColsOf(spark, root).toSet
    if (assigns.keySet.exists(parts))
      VersionedTable.updateMove(spark, root, pred, assigns)
    else VersionedTable.updateWhere(spark, root, pred, assigns)
  }

  private def executeMerge(spark: SparkSession, c: Cursor,
      tables: Map[String, String]): Int = {
    c.expectKeywords("INTO")
    val root = rootOf(tables, c.ident())
    c.tryKeywords("AS")
    val tgtAlias = if (c.atKeyword("USING")) None else Some(c.ident())
    c.expectKeywords("USING")
    val source: DataFrame =
      if (c.atChar('(')) spark.sql(c.balanced())
      else {
        val name = c.ident()
        tables.get(name).map(VersionedTable.read(spark, _))
          .getOrElse(spark.table(name))
      }
    c.tryKeywords("AS")
    val srcAlias = if (c.atKeyword("ON")) None else Some(c.ident())
    c.expectKeywords("ON")
    val onText = c.until("WHEN")
    val keys = splitTopLevelKeyword(onText, "AND").map(
      keyOf(spark, _, tgtAlias, srcAlias))

    var matched = List.empty[Dml.MergeClause]
    var notMatched: Option[Column] = None
    while (!c.eof) {
      if (c.tryKeywords("WHEN", "NOT", "MATCHED")) {
        require(notMatched.isEmpty, "at most one WHEN NOT MATCHED clause")
        val cond =
          if (c.tryKeywords("AND"))
            parseScalar(spark, c.until("THEN"), srcAlias, None)
          else lit(true)
        c.expectKeywords("THEN", "INSERT")
        parseInsertShape(spark, c, srcAlias, source)
        notMatched = Some(cond)
      } else {
        c.expectKeywords("WHEN", "MATCHED")
        val cond =
          if (c.tryKeywords("AND"))
            parseScalar(spark, c.until("THEN"), tgtAlias, srcAlias)
          else lit(true)
        c.expectKeywords("THEN")
        if (c.tryKeywords("DELETE"))
          matched :+= Dml.WhenMatchedDelete(cond)
        else {
          c.expectKeywords("UPDATE", "SET")
          val setText = c.until("WHEN")
          val set = splitTopLevel(setText, ',').map { a =>
            val eq = topLevelIndexOf(a, '=')
            require(eq > 0, s"malformed assignment: $a")
            stripQualifier(a.take(eq).trim, tgtAlias) ->
              parseScalar(spark, a.drop(eq + 1), tgtAlias, srcAlias)
          }.toMap
          matched :+= Dml.WhenMatchedUpdate(cond, set)
        }
      }
    }
    VersionedTable.mergeClauses(spark, root, source, keys, matched,
      notMatched, partColsOf(spark, root))
  }

  /** `INSERT *`, or `INSERT (cols) VALUES (src.cols)` restricted to the
    * identity mapping [[Dml.mergeClauses]] implements (source rows cast to
    * the target schema by NAME) — anything else must be projected into the
    * source subquery, and saying so beats silently reordering columns. */
  private def parseInsertShape(spark: SparkSession, c: Cursor,
      srcAlias: Option[String], source: DataFrame): Unit = {
    if (c.tryChar('*')) return
    require(c.atChar('('), "INSERT needs * or a (column list)")
    val cols = splitTopLevel(c.balanced(), ',').map(_.trim)
    c.expectKeywords("VALUES")
    require(c.atChar('('), "VALUES needs a parenthesized list")
    val vals = splitTopLevel(c.balanced(), ',')
      .map(v => stripQualifier(v.trim, srcAlias))
    require(cols == vals,
      s"only identity INSERT is supported — each VALUES item must be the " +
        s"same-named source column (got (${cols.mkString(",")}) VALUES " +
        s"(${vals.mkString(",")})); project the USING subquery instead")
    val missing = cols.filterNot(source.columns.contains)
    require(missing.isEmpty, s"INSERT names absent from the source: ${missing.mkString(", ")}")
  }

  // ----------------------------------------------------------- expressions

  /** Parse one scalar expression with Spark's SQL parser, rewriting alias
    * qualifiers: `tgt.c` → target column `c`, `src.c` → the [[Dml.src]]
    * reference. Unqualified names pass through (target columns, per SQL
    * MERGE; for UPDATE/DELETE there is no source side at all). */
  private def parseScalar(spark: SparkSession, text: String,
      tgtAlias: Option[String], srcAlias: Option[String]): Column = {
    val parsed = spark.sessionState.sqlParser.parseExpression(text)
    toColumn(parsed.transformUp {
      case a: UnresolvedAttribute if a.nameParts.length == 2 =>
        val q = a.nameParts.head
        if (srcAlias.exists(_.equalsIgnoreCase(q)))
          UnresolvedAttribute(Seq(s"__src_${a.nameParts(1)}"))
        else if (tgtAlias.exists(_.equalsIgnoreCase(q)))
          UnresolvedAttribute(Seq(a.nameParts(1)))
        else throw new IllegalArgumentException(
          s"unknown qualifier '$q' in: $text")
    })
  }

  /** One ON conjunct → the merge key it names. The verb's contract is
    * same-named equi-keys; both `ta.k = sa.k` orders are accepted, as is
    * bare `k = k`. */
  private def keyOf(spark: SparkSession, conjunct: String,
      tgtAlias: Option[String], srcAlias: Option[String]): String = {
    def side(e: Expression): Option[(Option[String], String)] = e match {
      case a: UnresolvedAttribute if a.nameParts.length == 1 =>
        Some((None, a.nameParts.head))
      case a: UnresolvedAttribute if a.nameParts.length == 2 =>
        Some((Some(a.nameParts.head), a.nameParts(1)))
      case _ => None
    }
    spark.sessionState.sqlParser.parseExpression(conjunct) match {
      case EqualTo(l, r) =>
        (side(l), side(r)) match {
          case (Some((ql, nl)), Some((qr, nr))) if nl.equalsIgnoreCase(nr) &&
              Seq(ql, qr).forall(q => q.isEmpty ||
                tgtAlias.exists(q.get.equalsIgnoreCase) ||
                srcAlias.exists(q.get.equalsIgnoreCase)) => nl
          case _ => throw new IllegalArgumentException(
            s"MERGE ON conjunct must be a same-named equi-key (ta.k = sa.k): $conjunct")
        }
      case _ => throw new IllegalArgumentException(
        s"MERGE ON conjunct must be an equality: $conjunct")
    }
  }

  private def stripQualifier(name: String, alias: Option[String]): String = {
    val n = name.stripPrefix("`").stripSuffix("`")
    alias match {
      case Some(a) if n.length > a.length + 1 &&
          n.regionMatches(true, 0, a, 0, a.length) && n(a.length) == '.' =>
        n.drop(a.length + 1)
      case _ => n
    }
  }

  // -------------------------------------------------- quote-aware scanning
  // The statement splitter never interprets expression CONTENT — it only
  // finds top-level structure boundaries (keywords, commas, '=' and
  // balanced parens) outside quotes, then hands each span to Spark's
  // parser. Quote handling covers '…' (with '' doubling), "…" and `…`.

  private def scanStep(s: String, i0: Int): Int = s(i0) match {
    case q @ ('\'' | '"' | '`') =>
      var i = i0 + 1
      while (i < s.length && s(i) != q) i += 1
      i + 1 // past the close (a doubled '' reopens at the next scan step)
    case _ => i0 + 1
  }

  /** Index of the first top-level `ch` (depth 0, outside quotes), or -1. */
  private def topLevelIndexOf(s: String, ch: Char): Int = {
    var i = 0; var depth = 0
    while (i < s.length) {
      s(i) match {
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case c if depth == 0 && c == ch => return i
        case '\'' | '"' | '`' => i = scanStep(s, i)
        case _ => i += 1
      }
    }
    -1
  }

  private def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    var start = 0; var i = 0; var depth = 0
    while (i < s.length) {
      s(i) match {
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case c if depth == 0 && c == sep =>
          out += s.substring(start, i); start = i + 1; i += 1
        case '\'' | '"' | '`' => i = scanStep(s, i)
        case _ => i += 1
      }
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private def isWordChar(c: Char) = c.isLetterOrDigit || c == '_'

  private def keywordAt(s: String, i: Int, kw: String): Boolean =
    s.regionMatches(true, i, kw, 0, kw.length) &&
      (i == 0 || !isWordChar(s(i - 1))) &&
      (i + kw.length >= s.length || !isWordChar(s(i + kw.length)))

  /** First top-level word-boundary occurrence of `kw`, or -1. */
  private def topLevelKeywordIndex(s: String, kw: String, from: Int = 0): Int = {
    var i = from; var depth = 0
    while (i < s.length) {
      s(i) match {
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case '\'' | '"' | '`' => i = scanStep(s, i)
        case _ =>
          if (depth == 0 && keywordAt(s, i, kw)) return i
          i += 1
      }
    }
    -1
  }

  /** Split on a top-level KEYWORD separator (`AND` between ON conjuncts). */
  private def splitTopLevelKeyword(s: String, kw: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var start = 0
    var at = topLevelKeywordIndex(s, kw)
    while (at >= 0) {
      out += s.substring(start, at)
      start = at + kw.length
      at = topLevelKeywordIndex(s, kw, start)
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Statement cursor: consumes keywords/identifiers/balanced chunks and
    * top-level spans. */
  private final class Cursor(s: String) {
    private var i = 0
    private def skipWs(): Unit =
      while (i < s.length && s(i).isWhitespace) i += 1
    def eof: Boolean = { skipWs(); i >= s.length }
    def rest(): String = { skipWs(); val r = s.substring(i); i = s.length; r }

    def atChar(c: Char): Boolean = { skipWs(); i < s.length && s(i) == c }
    def tryChar(c: Char): Boolean =
      if (atChar(c)) { i += 1; true } else false

    def atKeyword(kw: String): Boolean = { skipWs(); keywordAt(s, i, kw) }

    def tryKeywords(kws: String*): Boolean = {
      val save = i
      val ok = kws.forall { kw =>
        skipWs()
        if (keywordAt(s, i, kw)) { i += kw.length; true } else false
      }
      if (!ok) i = save
      ok
    }

    def expectKeywords(kws: String*): Unit =
      require(tryKeywords(kws: _*),
        s"expected ${kws.mkString(" ")} at: ${s.substring(math.min(i, s.length)).take(50)}")

    def ident(): String = {
      skipWs()
      val start = i
      if (i < s.length && s(i) == '`') {
        i += 1
        while (i < s.length && s(i) != '`') i += 1
        require(i < s.length, s"unterminated identifier at ${s.substring(start)}")
        i += 1
        s.substring(start + 1, i - 1)
      } else {
        while (i < s.length && (isWordChar(s(i)) || s(i) == '.')) i += 1
        require(i > start, s"expected identifier at: ${s.substring(start).take(40)}")
        s.substring(start, i)
      }
    }

    /** Consume a balanced `(...)` chunk, returning the inner text. */
    def balanced(): String = {
      skipWs()
      require(i < s.length && s(i) == '(', s"expected ( at: ${s.substring(i).take(40)}")
      val start = i; var depth = 0
      while (i < s.length) {
        s(i) match {
          case '(' => depth += 1; i += 1
          case ')' =>
            depth -= 1; i += 1
            if (depth == 0) return s.substring(start + 1, i - 1)
          case '\'' | '"' | '`' => i = scanStep(s, i)
          case _ => i += 1
        }
      }
      throw new IllegalArgumentException(s"unbalanced parens at: ${s.substring(start).take(40)}")
    }

    /** Consume and return the span up to (not including) the first
      * top-level occurrence of `kw`, or everything if absent. */
    def until(kw: String): String = {
      skipWs()
      val at = topLevelKeywordIndex(s, kw, i)
      val end = if (at < 0) s.length else at
      val out = s.substring(i, end).trim
      i = end
      out
    }
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
      Some(sinkOracle("sink_merge_into"))))
}
