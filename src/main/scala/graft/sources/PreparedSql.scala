package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.graft.{expressions => bridge}

/** Prepared-statement surface for SQL strings (r16, VERDICT r15 #3): the
  * per-query cost a `spark.sql(text)` serving path pays on EVERY request is
  * parse → analyze → optimize → physical planning — ~50–130 ms on this
  * host, the long-adjudicated floor behind the `oltp_invoice_lookup` bench
  * row, irrelevant per-scan at 100 TB but dominant for a dashboard's
  * repeated sub-second queries. [[prepare]] plans the text ONCE and pins
  * the PHYSICAL plan; every later [[Prepared.run]]/[[Prepared.executedPlan]]
  * re-executes it directly (new Spark jobs, real scan work — only the
  * planning amortizes), the PostgreSQL `PREPARE`/`EXECUTE` contract the
  * reference's serving layer gets from its DBMS.
  *
  * Staleness contract: a statement over VERSIONED tables (a non-empty
  * `tables` map, resolved through [[SqlDml.query]]) re-reads each table's
  * committed head — a tiny `_latest` read per table — before serving and
  * REBUILDS the plan whenever any head moved, so a prepared handle can
  * never serve a pre-commit snapshot (the same cross-process head check
  * discipline as [[graft.plans.StatsPrune]]/[[graft.plans.MvRewrite]]).
  * A statement over session views (`tables` empty) pins the plan
  * unconditionally — views over the memoized warehouse are stable by
  * construction; re-prepare after re-registering views over new data. */
object PreparedSql {

  final class Prepared private[PreparedSql] (spark: SparkSession,
      sql: String, tables: Map[String, String]) {

    @volatile private var pin:
        (Map[String, Int], org.apache.spark.sql.execution.QueryExecution) = null

    private def heads(): Map[String, Int] =
      tables.map { case (n, r) => n -> VersionedTable.latestVersion(spark, r) }

    private def ensureCurrent(): org.apache.spark.sql.execution.QueryExecution = {
      val h = if (tables.isEmpty) Map.empty[String, Int] else heads()
      val p = pin
      if (p != null && p._1 == h) p._2
      else {
        val df =
          if (tables.isEmpty) spark.sql(sql) else SqlDml.query(spark, sql, tables)
        val qe = bridge.queryExecution(df)
        qe.executedPlan // force planning at prepare/rebuild time
        pin = (h, qe)
        qe
      }
    }

    /** The pinned physical plan, current as of the tables' committed
      * heads — execute it directly for the lowest-overhead serving read
      * (`executedPlan.execute()` yields the result RDD). */
    def executedPlan: org.apache.spark.sql.execution.SparkPlan =
      ensureCurrent().executedPlan

    /** Serve the statement from the pinned plan: no parse, no analysis, no
      * optimization — the physical plan executes and the rows come back as
      * an eagerly materialized DataFrame (the handle's results must not
      * lazily re-plan later). */
    def run(): DataFrame = {
      val (rows, schema) = bridge.collectExecuted(spark, ensureCurrent())
      spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), schema)
    }
  }

  /** Plan `sql` once (against the versioned tables in `tables`, or the
    * session catalog when empty) and return the re-executable handle. */
  def prepare(spark: SparkSession, sql: String,
      tables: Map[String, String] = Map.empty): Prepared = {
    val h = new Prepared(spark, sql, tables)
    h.executedPlan // eager: preparation IS the planning
    h
  }
}
