package graft.measures

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.etl.Warehouse

/** Consistency checks across the 14 measures on the sf0.001 warehouse. */
class MeasuresSpec extends SparkSpec {

  private lazy val w = Warehouse(spark, sfDir)

  /** Time-intelligence measures run in date context: fact rows carrying the
    * 1970 fallback date_key (unparseable timestamps) have no dim_date row and
    * are correctly excluded — so the comparison total is the date-matched sum,
    * not the raw fact sum. */
  private def dateMatchedTotal: Double =
    w.factSalesElt.select("date_key", "totalamount")
      .join(w.dimDate.select("date_key"), Seq("date_key"))
      .agg(sum("totalamount").cast("double")).head().getDouble(0)

  test("cumulative revenue ends at the date-matched total") {
    val lastCum = Measures.cumulative(w).orderBy(col("month").desc)
      .select("cumulative_revenue").head().getDouble(0)
    assert(lastCum === dateMatchedTotal)
  }

  test("monthly revenue sums to the date-matched total and is below the raw fact total") {
    val summed = Measures.monthlyRevenue(w).agg(sum("monthly_revenue")).head().getDouble(0)
    assert(math.abs(summed - dateMatchedTotal) < 1e-6)
    assert(summed < Measures.totalRevenue(w).head().getDouble(0))
  }

  test("ARPO * orders == total revenue (within double rounding)") {
    val total = Measures.totalRevenue(w).head().getDouble(0)
    val arpo = Measures.arpo(w).head().getDouble(0)
    val orders = Measures.totalOrders(w).head().getLong(0)
    assert(math.abs(arpo * orders - total) < 1e-6 * total)
  }

  test("rolling 3-month >= monthly everywhere and equals it for the first month") {
    val bad = Measures.rolling3m(w)
      .filter(col("rolling_3m_revenue") < col("monthly_revenue")).count()
    assert(bad === 0)
    val first = Measures.rolling3m(w).orderBy("month").head()
    assert(first.getDouble(1) === first.getDouble(2))
  }

  test("YoY growth matches a hand-computed ratio") {
    val rows = Measures.yoyGrowth(w).orderBy("year").collect()
    assert(rows.head.isNullAt(2)) // first year has no prior
    val r = rows(1)
    val prev = rows(0).getDouble(1)
    val cur = r.getDouble(1)
    assert(math.abs(r.getDouble(2) - (cur - prev) / prev) < 1e-12)
  }

  test("high-value sales counts rows above the threshold") {
    val expected = w.factSalesElt.filter(col("totalamount") > 1000).count()
    assert(Measures.highValueSales(w).head().getLong(0) === expected)
  }

  test("top region formats as 'Name — 1,234,567'") {
    val s = Measures.topRegion(w).head().getString(0)
    assert(s.matches(".+ — [0-9,]+"), s)
  }

  test("filter context: a year slicer restricts every downstream measure") {
    val y1996 = Measures.sliced(w,
      (col("date_key") >= 19960101000000L) && (col("date_key") <= 19961231235959L))
    val slicedRev = Measures.totalRevenue(y1996).head().getDouble(0)
    val fullRev = Measures.totalRevenue(w).head().getDouble(0)
    val expected = w.factSalesElt
      .filter(col("date_key").between(19960101000000L, 19961231235959L))
      .agg(sum("totalamount").cast("double")).head().getDouble(0)
    assert(slicedRev === expected)
    assert(slicedRev < fullRev)
    assert(Measures.highValueSales(y1996).head().getLong(0) <=
      Measures.highValueSales(w).head().getLong(0))
  }

  test("country slicer equals a direct dim-joined filter") {
    val sliced = Measures.totalRevenueSlicedByCountry(w, "Nation_7").head().getDouble(0)
    val expected = w.factSalesElt
      .join(w.dimCustomerElt.select("customer_key", "country"), Seq("customer_key"), "left")
      .filter(col("country") === "Nation_7")
      .agg(sum("totalamount").cast("double")).head().getDouble(0)
    assert(sliced === expected)
    assert(sliced > 0)
    assert(sliced < Measures.totalRevenue(w).head().getDouble(0))
  }

  test("approximate cardinalities land within 5% of exact counts") {
    val r = Measures.approxCardinalities(w).head()
    val exactOrders = Measures.totalOrders(w).head().getLong(0).toDouble
    assert(math.abs(r.getLong(0) - exactOrders) / exactOrders < 0.05)
  }
}
