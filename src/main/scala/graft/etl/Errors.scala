package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft._
import graft.oracle.OracleSql.q

/** Reject auditing (S7/J8): rows of the cleaned sales feed that missed a
  * dimension (reference `Iteration 1/Group No.6_ETL.sql:373-394`) land in an
  * error frame with a JSON payload of the source row + reason + timestamp.
  *
  * The detection is the reference's LEFT-join-then-null-check shape (keeps
  * per-dimension reason); at scale each probe is a broadcast join against a
  * dim. The registered queries compare the reason summary and the rejected
  * natural keys; the JSON payload column itself is engine-formatted and not
  * hash-compared (whitespace conventions differ across engines).
  */
object Errors extends QueryRegistry {

  /** Full reject audit frame (engine API): one row per rejected sales row
    * with `source_table`, JSON `source_row`, `error_message`, `created_at`. */
  def etlErrors(w: Warehouse): DataFrame = {
    val flagged = rejectFlags(w)
    flagged.select(
      lit("staging.sales_clean").as("source_table"),
      to_json(struct(
        col("invoiceid"), col("stockcode"), col("customerid"), col("sale_ts"),
        col("quantity"), col("unitprice"), col("totalamount"), col("linenumber")))
        .as("source_row"),
      col("error_message"),
      current_timestamp().as("created_at"))
  }

  /** sales_final rows left-probed against each dim, with a reason string
    * listing every missing dimension. */
  private def rejectFlags(w: Warehouse): DataFrame =
    w.salesFinal
      .join(w.dimProduct.select("stockcode", "product_key"), Seq("stockcode"), "left")
      .join(w.dimCustomer.select("customerid", "customer_key"), Seq("customerid"), "left")
      .join(w.dimDate.select(col("date_key").as("d_key")),
        smartDateKey(col("sale_ts")) === col("d_key"), "left")
      .filter(col("product_key").isNull || col("customer_key").isNull || col("d_key").isNull)
      .withColumn("error_message",
        concat_ws("/",
          when(col("product_key").isNull, lit("missing product")),
          when(col("customer_key").isNull, lit("missing customer")),
          when(col("d_key").isNull, lit("missing date"))))

  /** Reject counts by reason — the auditable summary. */
  def errorSummary(w: Warehouse): DataFrame =
    rejectFlags(w).groupBy("error_message").agg(count(lit(1)).as("n"))

  /** The rejected natural keys (deterministic identity of the reject set). */
  def rejectedRows(w: Warehouse): DataFrame =
    rejectFlags(w).select("invoiceid", "stockcode", "customerid", "linenumber", "error_message")

  /** Load invariant: every input row is either loaded or rejected;
    * fact count == input count (the fact keeps all rows via left joins, as
    * the reference's fact load does) and reject count == audit count. */
  def loadReconciliation(w: Warehouse): DataFrame = {
    val input = w.salesFinal.agg(count(lit(1)).as("v")).select(lit("sales_final_rows").as("metric"), col("v").as("value"))
    val loaded = w.factSales.agg(count(lit(1)).as("v")).select(lit("fact_rows").as("metric"), col("v").as("value"))
    val rejected = rejectFlags(w).agg(count(lit(1)).as("v")).select(lit("rejected_rows").as("metric"), col("v").as("value"))
    input.union(loaded).union(rejected)
  }

  private val rejectSql = """
      SELECT s.*,
             concat_ws('/',
               CASE WHEN p.product_key IS NULL THEN 'missing product' END,
               CASE WHEN c.customer_key IS NULL THEN 'missing customer' END,
               CASE WHEN d.date_key IS NULL THEN 'missing date' END) AS error_message
      FROM sales_final s
      LEFT JOIN dim_product p ON s.stockcode = p.stockcode
      LEFT JOIN dim_customer c ON s.customerid = c.customerid
      LEFT JOIN dim_date d ON CAST(strftime(s.sale_ts, '%Y%m%d%H%M%S') AS BIGINT) = d.date_key
      WHERE p.product_key IS NULL OR c.customer_key IS NULL OR d.date_key IS NULL"""

  def defs: Seq[QueryDef] = Seq(
    QueryDef("etl_error_summary", (s, dir) => errorSummary(Warehouse(s, dir)), Some(q(s"""
      , rejects AS ($rejectSql)
      SELECT error_message, count(*) AS n FROM rejects GROUP BY error_message"""))),

    QueryDef("etl_rejected_rows", (s, dir) => rejectedRows(Warehouse(s, dir)), Some(q(s"""
      , rejects AS ($rejectSql)
      SELECT invoiceid, stockcode, customerid, linenumber, error_message FROM rejects"""))),

    QueryDef("etl_load_reconciliation", (s, dir) => loadReconciliation(Warehouse(s, dir)), Some(q(s"""
      , rejects AS ($rejectSql)
      SELECT 'sales_final_rows' AS metric, count(*) AS value FROM sales_final
      UNION ALL
      SELECT 'fact_rows' AS metric, count(*) AS value FROM fact_sales
      UNION ALL
      SELECT 'rejected_rows' AS metric, count(*) AS value FROM rejects"""))))
}
