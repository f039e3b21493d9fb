package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit tests per cleaning transform on hand-built dirty inputs
  * (FIXTURES.md §1 traits). */
class TransformsSpec extends SparkSpec {
  import spark.implicits._

  private def stgCustomers(rows: (String, String, String, String)*): DataFrame =
    rows.toDF("customerid", "customername", "country", "signupdate")

  test("customersBase drops blank ids, trims, initcaps, validates dates") {
    val out = Transforms.customersBase(stgCustomers(
      ("  42 ", "  alice SMITH  ", "gERMANY", "2020-01-31"),
      ("", "noid", "France", "2020-01-01"),
      ("   ", "blankid", "France", "2020-01-01"),
      ("7", "", "", "not-a-date"),
      ("8", "bob", "UK", "2020-13-99"))).collect().map(r => (r.getString(0), r.getString(1), r.getString(2), Option(r.getDate(3)).map(_.toString)))
    assert(out.toSet === Set(
      ("42", "Alice smith", "Germany", Some("2020-01-31")),
      ("7", null, null, None),
      ("8", "Bob", "Uk", None))) // 2020-13-99 matches the shape regex but fails the cast → NULL
  }

  test("dimCustomer keeps latest signup per id; dimCustomerElt keeps earliest") {
    val base = Transforms.customersBase(stgCustomers(
      ("1", "A", "X", "2020-01-01"),
      ("1", "A", "X", "2021-06-01"),
      ("1", "A", "X", "not-a-date")))
    val latest = Transforms.dimCustomer(base).select("signupdate").as[java.sql.Date].collect()
    val earliest = Transforms.dimCustomerElt(base).select("signupdate").collect().map(_.get(0))
    assert(latest.map(_.toString).toSeq === Seq("2021-06-01"))
    assert(earliest.toSeq === Seq(null)) // NULLS FIRST ascending: null signup wins
  }

  test("productsBase strips currency symbols and keeps sign; blank stockcode dropped") {
    val out = Transforms.productsBase(Seq(
      ("10", "widget", "$12.34", "toys", "B"),
      ("11", "gadget", "-1.00", "toys", "B"),
      ("12", "gizmo", "N/A", "toys", "B"),
      ("", "ghost", "9.99", "toys", "B"))
      .toDF("stockcode", "description", "unitprice", "category", "brand"))
      .select("stockcode", "unitprice_raw").as[(String, Option[BigDecimal])].collect().toMap
    assert(out.keySet === Set("10", "11", "12"))
    assert(out("10").get === BigDecimal("12.34"))
    assert(out("11").get === BigDecimal("-1.00"))
    assert(out("12").isEmpty)
  }

  test("dimProduct falls back to the median for null/non-positive prices") {
    val pd = Transforms.productsDedup(Transforms.productsBase(Seq(
      ("1", "a", "10.00", "c", "b"),
      ("2", "b", "20.00", "c", "b"),
      ("3", "c", "30.00", "c", "b"),
      ("4", "d", "-5.00", "c", "b"),
      ("5", "e", "junk", "c", "b"))
      .toDF("stockcode", "description", "unitprice", "category", "brand")))
    val median = Transforms.medianPrice(pd)
    assert(median === 20.0)
    val prices = Transforms.dimProduct(pd, median)
      .select("stockcode", "unitprice").as[(String, BigDecimal)].collect().toMap
    assert(prices("4") === BigDecimal("20.00"))
    assert(prices("5") === BigDecimal("20.00"))
    assert(prices("1") === BigDecimal("10.00"))
  }

  test("salesParsed parses both timestamp formats and defaults quantity to 0") {
    val out = Transforms.salesParsed(Seq(
      ("i1", "s1", "c1", "2020-05-17 10:30:00", "3", "1.50", "4.50", "1"),
      ("i2", "s1", "c1", "17/05/2020 10:30:00", "junk", "1.50", "", "2"),
      ("i3", "s1", "c1", "invalid-ts", "2", "1.50", "3.00", "3"),
      ("", "s1", "c1", "2020-05-17 10:30:00", "1", "1", "1", "4"))
      .toDF("invoiceid", "stockcode", "customerid", "saledate", "quantity", "unitprice", "totalamount", "linenumber"))
      .select("invoiceid", "sale_ts", "quantity").collect()
      .map(r => (r.getString(0), Option(r.get(1)).map(_.toString), r.getInt(2))).toSet
    assert(out === Set(
      ("i1", Some("2020-05-17T10:30"), 3),
      ("i2", Some("2020-05-17T10:30"), 0),
      ("i3", None, 2)))
  }

  test("salesFinal repairs non-positive prices from the product dim and recomputes totals") {
    val dimP = Transforms.dimProduct(Transforms.productsDedup(Transforms.productsBase(
      Seq(("s1", "a", "5.00", "c", "b")).toDF("stockcode", "description", "unitprice", "category", "brand"))), 5.0)
    val out = Transforms.salesFinal(Transforms.salesParsed(Seq(
      ("i1", "s1", "c1", "2020-01-01 00:00:00", "4", "0", "", "1"), // price 0 → 5.00; total blank → 4*5.00
      ("i2", "s1", "c1", "2020-01-01 00:00:00", "2", "3.00", "7.00", "1")) // kept as-is
      .toDF("invoiceid", "stockcode", "customerid", "saledate", "quantity", "unitprice", "totalamount", "linenumber")), dimP)
      .select("invoiceid", "unitprice", "totalamount").as[(String, BigDecimal, BigDecimal)]
      .collect().map { case (k, u, t) => k -> ((u, t)) }.toMap
    val m = out
    assert(m("i1") === ((BigDecimal("5.00"), BigDecimal("20.00"))))
    assert(m("i2") === ((BigDecimal("3.00"), BigDecimal("7.00"))))
  }

  test("tsDomain dedups the union of sales timestamps and the date feed") {
    val sp = Transforms.salesParsed(Seq(
      ("i1", "s1", "c1", "2020-01-01 00:00:00", "1", "1", "1", "1"),
      ("i2", "s1", "c1", "2020-01-01 00:00:00", "1", "1", "1", "1"))
      .toDF("invoiceid", "stockcode", "customerid", "saledate", "quantity", "unitprice", "totalamount", "linenumber"))
    val dates = Seq("2020-01-01", "2020-02-02").toDF("d")
    assert(Transforms.tsDomain(sp, dates).count() === 2)
  }

  test("dimDate derives smart key, ISO weekend flag, weekday name") {
    val sp = Transforms.salesParsed(Seq(
      ("i1", "s1", "c1", "2020-05-17 10:30:45", "1", "1", "1", "1"), // Sunday
      ("i2", "s1", "c1", "2020-05-15 00:00:00", "1", "1", "1", "1")) // Friday
      .toDF("invoiceid", "stockcode", "customerid", "saledate", "quantity", "unitprice", "totalamount", "linenumber"))
    val rows = Transforms.dimDate(Transforms.tsDomain(sp, spark.emptyDataset[String].toDF("d")))
      .select("date_key", "weekday", "is_weekend", "full_time")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2), r.getString(3))).toSet
    assert(rows === Set(
      (20200517103045L, "Sunday", true, "10:30:45"),
      (20200515000000L, "Friday", false, "00:00:00")))
  }

  test("factSales uses the 1970 fallback key for unparseable timestamps") {
    val dimP = Transforms.dimProduct(Transforms.productsDedup(Transforms.productsBase(
      Seq(("s1", "a", "5.00", "c", "b")).toDF("stockcode", "description", "unitprice", "category", "brand"))), 5.0)
    val base = Transforms.customersBase(stgCustomers(("c1", "n", "X", "2020-01-01")))
    val dimC = Transforms.dimCustomer(base)
    val sf = Transforms.salesFinal(Transforms.salesParsed(Seq(
      ("i1", "s1", "c1", "invalid-ts", "1", "1.00", "1.00", "1"))
      .toDF("invoiceid", "stockcode", "customerid", "saledate", "quantity", "unitprice", "totalamount", "linenumber")), dimP)
    val keys = Transforms.factSales(sf, dimP, dimC).select("date_key").as[Long].collect()
    assert(keys.toSeq === Seq(19700101000000L))
  }
}
