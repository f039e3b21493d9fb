package graft.plans

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.TestSpark

/** Result-invariance properties for the inferred-year-bounds rule, under the
  * invariant the rule requires (see [[InferYearBoundsFromDateKey]]'s doc):
  * `year = date_key / 10^10` on the rows the predicate keeps — the engine's
  * write-path guarantee. Property 1 uses fully key-derived `year`; property 2
  * weakens it to the minimum the rewrite needs (truthful `year` only inside
  * the filter range, arbitrary outside), showing dropped-by-the-predicate
  * rows place no constraint on `year`. The rule makes NO claim for tables
  * that violate the invariant on kept rows — that is exactly why it is
  * gated behind `spark.graft.inferYearBounds.enabled`. */
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

  private def withRule[A](f: => A): A = {
    spark.experimental.extraOptimizations = Seq(InferYearBoundsFromDateKey)
    spark.conf.set(InferYearBoundsFromDateKey.EnabledKey, "true")
    try f finally {
      spark.conf.unset(InferYearBoundsFromDateKey.EnabledKey)
      spark.experimental.extraOptimizations = Nil
    }
  }

  property("key-derived year: results identical with and without the rule") =
    Prop.forAll(rowsGen, keyGen, keyGen) { (keys, b1, b2) =>
      val (lo, hi) = (math.min(b1, b2), math.max(b1, b2))
      val df = keys.zipWithIndex.toDF("date_key", "v")
        .withColumn("year", graft.yearOfDateKey(col("date_key")))
      def run() = df.filter(col("date_key").between(lo, hi))
        .agg(count(lit(1)), coalesce(sum("v"), lit(0L))).head.toSeq
      val plain = run()
      val ruled = withRule(run())
      plain == ruled
    }

  property("year truthful only on kept rows: rows outside the filter range may lie") =
    Prop.forAll(rowsGen, Gen.chooseNum(1992, 1999), keyGen, keyGen) { (keys, fakeYear, b1, b2) =>
      val (lo, hi) = (math.min(b1, b2), math.max(b1, b2))
      // The weakest precondition the rewrite needs: on rows the predicate
      // keeps, year derives from the key (so year-from-key lands inside
      // [lo/K, hi/K] and the inferred conjunct is implied); rows the
      // predicate drops are unconstrained — give them an arbitrary year.
      val df = keys.zipWithIndex.toDF("date_key", "v")
        .withColumn("year",
          when(col("date_key").between(lo, hi), graft.yearOfDateKey(col("date_key")))
            .otherwise(lit(fakeYear)))
      def run() = df.filter(col("date_key").between(lo, hi))
        .agg(count(lit(1)), coalesce(sum("v"), lit(0L))).head.toSeq
      val plain = run()
      val ruled = withRule(run())
      plain == ruled
    }
}
