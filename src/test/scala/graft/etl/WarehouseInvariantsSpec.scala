package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.olap.Molap

/** End-to-end invariants over the sf0.001 warehouse — the checks the
  * reference runs as embedded validation SQL (SURVEY.md §5.1). */
class WarehouseInvariantsSpec extends SparkSpec {

  private lazy val w = Warehouse(spark, sfDir)

  test("the driver's flagship entry point returns rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("oracle prefix resource is byte-identical to the dev-loop checker copy") {
    // tools/check.py reads tools/prefix.sql while the shipped oracle SQL
    // embeds the classpath resource — a drifted copy would make the local
    // gate and the driver's gate silently check different warehouses
    val dev = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("tools/prefix.sql")), "UTF-8")
    assert(graft.oracle.OracleSql.prefix === dev)
  }

  test("revenue reconciliation: fact total == cleaned-staging total") {
    val fact = w.factSales.agg(sum("totalamount")).head().getDecimal(0)
    val staging = w.salesFinal.agg(sum("totalamount")).head().getDecimal(0)
    assert(fact === staging)
  }

  test("ETL and ELT facts agree on row count and revenue") {
    assert(w.factSales.count() === w.factSalesElt.count())
    assert(w.factSales.agg(sum("totalamount")).head().getDecimal(0) ===
      w.factSalesElt.agg(sum("totalamount")).head().getDecimal(0))
  }

  test("fact load preserves every cleaned input row (left-join load)") {
    assert(w.factSales.count() === w.salesFinal.count())
  }

  test("dedup keeps exactly one row per natural key") {
    assert(w.dimCustomer.groupBy("customerid").count().filter(col("count") > 1).count() === 0)
    assert(w.dimProduct.groupBy("stockcode").count().filter(col("count") > 1).count() === 0)
    assert(w.dimDate.groupBy("date_key").count().filter(col("count") > 1).count() === 0)
  }

  test("dimCustomer keeps the max signupdate of each duplicate group") {
    val latest = w.customersBase.groupBy("customerid").agg(max("signupdate").as("max_d"))
    val joined = w.dimCustomer.join(latest, Seq("customerid"))
      .filter(!(col("signupdate") <=> col("max_d")))
    assert(joined.count() === 0)
  }

  test("surrogate keys are collision-free at this scale") {
    assert(w.dimCustomer.select("customer_key").distinct().count() === w.dimCustomer.count())
    assert(w.dimProduct.select("product_key").distinct().count() === w.dimProduct.count())
  }

  test("MOLAP pre-aggregate reconciles with recomputed OLAP (diff == 0)") {
    val bad = Molap.verify(w).filter(col("diff") =!= 0).count()
    assert(bad === 0)
  }

  test("every reject reason accounts for a real dimension miss") {
    val rejects = Errors.rejectedRows(w)
    val n = rejects.count()
    assert(n > 0) // the synthetic dirty data always produces rejects
    val matchedCustomer = rejects.filter(col("error_message").contains("missing customer"))
      .join(w.dimCustomer, Seq("customerid"), "left_semi")
    assert(matchedCustomer.count() === 0)
  }

  test("date_key smart key is derivable from dim_date full_datetime") {
    val bad = w.dimDate
      .filter(graft.smartDateKey(col("full_datetime")) =!= col("date_key")).count()
    assert(bad === 0)
  }

  test("the fallback date key never appears in dim_date") {
    // Every `date_key =!= FallbackDateKey` filter in the OLAP/MOLAP layer
    // reproduces an inner dim_date join ONLY under this invariant: if the ts
    // domain ever contained 1970-01-01 00:00:00, dim_date would carry the
    // fallback key and the reference join would keep rows the filter drops.
    assert(w.dimDate.filter(col("date_key") === graft.FallbackDateKey).count() === 0)
  }

  test("ELT reject audit: reasons account for real ELT-dim misses") {
    val rejects = Errors.eltRejectedRows(w)
    assert(rejects.count() > 0) // the synthetic dirty data always produces rejects
    // every 'Missing customer mapping' row is genuinely absent from the ELT dim
    val matched = rejects.filter(col("error_message") === "Missing customer mapping")
      .join(w.dimCustomerElt, Seq("customerid"), "left_semi")
    assert(matched.count() === 0)
  }

  test("data-quality suite distinguishes verdicts and metrics are consistent ratios") {
    val report = Errors.dataQualitySuite(w)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(report.size === 7)
    // pass iff metric clears the threshold — the report's own invariant
    report.foreach { case (name, (m, t, p)) => assert(p === (m >= t), name) }
    // the planted invalid-ts rows make the strict parseability check FAIL
    // while the 99% check passes — verdicts genuinely distinguish
    assert(!report("saledate_parseable_all")._3)
    assert(report("saledate_parseable")._3)
    assert(report("saledate_parseable")._1 === report("saledate_parseable_all")._1)
    // completeness ratios reflect the generator's planted blank shares
    assert(report("invoiceid_complete")._1 > 0.99 && report("invoiceid_complete")._1 < 1.0)
    assert(report("totalamount_complete")._1 > 0.6 && report("totalamount_complete")._1 < 0.7)
    assert(report("quantity_all_digits")._1 === 1.0)
  }
}
