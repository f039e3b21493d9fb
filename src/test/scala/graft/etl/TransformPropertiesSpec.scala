package graft.etl

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.TestSpark

/** Property-based invariants over the cleaning transforms (SURVEY.md §5.2):
  * the guarantees hold for arbitrary dirty inputs, not just the fixture's. */
object TransformPropertiesSpec extends Properties("transforms") {

  // Spark jobs per case are expensive; 10 diverse cases per property suffice.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val idGen = Gen.chooseNum(1, 5).map(_.toString)
  private val dateGen = Gen.oneOf(
    Gen.chooseNum(1, 28).map(d => f"2020-01-$d%02d"),
    Gen.const("not-a-date"), Gen.const(""))
  private val rowGen = for { id <- idGen; d <- dateGen } yield (id, "n", "c", d)

  property("dedup keeps one row per id, bearing the max parseable date") =
    Prop.forAll(Gen.listOfN(12, rowGen)) { rows =>
      val base = Transforms.customersBase(
        rows.toDF("customerid", "customername", "country", "signupdate"))
      val dim = Transforms.dimCustomer(base)
      val dups = dim.groupBy("customerid").count().filter(col("count") > 1).count()
      val notMax = dim
        .join(base.groupBy("customerid").agg(max("signupdate").as("m")), Seq("customerid"))
        .filter(!(col("signupdate") <=> col("m"))).count()
      dups == 0 && notMax == 0
    }

  private val priceGen = Gen.oneOf(
    Gen.chooseNum(1, 9999).map(c => f"${c / 100.0}%.2f"),
    Gen.chooseNum(1, 9999).map(c => f"$$${c / 100.0}%.2f"),
    Gen.const("0"), Gen.const("-3.50"), Gen.const("junk"), Gen.const(""))

  private def oneProductDim = Transforms.dimProduct(
    Transforms.productsDedup(Transforms.productsBase(
      Seq(("s1", "x", "7.00", "c", "b"))
        .toDF("stockcode", "description", "unitprice", "category", "brand"))), 7.0)

  property("repaired unitprice is positive; blank totals reconcile to q*price") =
    Prop.forAll(Gen.listOfN(8, priceGen)) { prices =>
      val sales = prices.zipWithIndex.map { case (p, i) =>
        (s"i$i", "s1", "c1", "2020-01-01 00:00:00", "2", p, "", s"$i")
      }.toDF("invoiceid", "stockcode", "customerid", "saledate", "quantity", "unitprice", "totalamount", "linenumber")
      val out = Transforms.salesFinal(Transforms.salesParsed(sales), oneProductDim)
      val nonPositive = out.filter(col("unitprice") <= 0).count()
      val mismatch = out.filter(col("totalamount") =!=
        round(col("quantity") * col("unitprice"), 2).cast("decimal(18,2)")).count()
      nonPositive == 0 && mismatch == 0
    }

  property("fact load conserves row count and revenue") =
    Prop.forAll(Gen.listOfN(6, priceGen)) { prices =>
      val sales = prices.zipWithIndex.map { case (p, i) =>
        (s"i$i", "s1", "c1", "2020-01-01 00:00:00", "3", p, "9.99", s"$i")
      }.toDF("invoiceid", "stockcode", "customerid", "saledate", "quantity", "unitprice", "totalamount", "linenumber")
      val dimC = Transforms.dimCustomer(Transforms.customersBase(
        Seq(("c1", "n", "co", "2020-01-01")).toDF("customerid", "customername", "country", "signupdate")))
      val sf = Transforms.salesFinal(Transforms.salesParsed(sales), oneProductDim)
      val fact = Transforms.factSales(sf, oneProductDim, dimC)
      fact.count() == sf.count() &&
        fact.agg(sum("totalamount")).head().getDecimal(0) ==
          sf.agg(sum("totalamount")).head().getDecimal(0)
    }

  private val tsGen: Gen[java.sql.Timestamp] = for {
    y <- Gen.chooseNum(1970, 2099); mo <- Gen.chooseNum(1, 12); d <- Gen.chooseNum(1, 28)
    h <- Gen.chooseNum(0, 23); mi <- Gen.chooseNum(0, 59); s <- Gen.chooseNum(0, 59)
  } yield java.sql.Timestamp.valueOf(java.time.LocalDateTime.of(y, mo, d, h, mi, s))

  // The smart key must be a COVERING encoding of its date parts — the
  // invariant the dim-join-free OLAP/MOLAP access path rests on.
  property("smart key round-trips: decode(smartDateKey(ts)) == date/month of ts") =
    Prop.forAll(Gen.listOfN(12, tsGen)) { tss =>
      val df = tss.toDF("ts")
        .withColumn("k", graft.smartDateKey(col("ts")))
      df.filter(
        !(graft.dateOfDateKey(col("k")) <=> col("ts").cast("date")) ||
          !(graft.monthOfDateKey(col("k")) <=> trunc(col("ts"), "month")) ||
          !(graft.yearOfDateKey(col("k")) <=> year(col("ts"))) ||
          !(graft.monthNumOfDateKey(col("k")) <=> month(col("ts"))))
        // the 1970-01-01 00:00:00 second IS the fallback key and decodes to
        // NULL by design — the one legitimate mismatch
        .filter(col("k") =!= graft.FallbackDateKey).count() == 0
    }
}
