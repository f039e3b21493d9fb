package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r17 probe (VERDICT r16 #6): demonstrate [[graft.olap.Olap
  * .basketLiftPruned]]'s win on the catalog shape its docstring argues
  * from — a LONG-TAIL catalog where most SKUs sell a handful of times.
  * The sf0.1 synthetic feed has no tail (minPairN=2 keeps ~every item
  * frequent), so only the lose-case was measured there (1.91 → 2.39 s).
  *
  * Fixture: 150k baskets of 3-20 items; each item draw is a 40/60
  * head/tail mixture — head = uniform over 500 hot SKUs (frequent),
  * tail = near-unique draw from a 50M-SKU space (almost surely a
  * singleton, so the apriori cut drops it before the quadratic pair
  * fan-out). Fully deterministic (xxhash64 of basket/position — no RNG).
  * The probe times both variants over the same cached feed and asserts
  * they return IDENTICAL rows. Run: `runMain graft.tools.BasketProbe`. */
object BasketProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val nBaskets = 150000L
    val sales = spark.range(nBaskets).select(col("id").as("invoiceid"))
      .select(col("invoiceid"), explode(sequence(lit(1),
        (lit(3) + pmod(xxhash64(col("invoiceid"), lit(1)), lit(18))).cast("int")))
        .as("j"))
      .select(col("invoiceid"),
        when(pmod(xxhash64(col("invoiceid"), col("j"), lit(7)), lit(100)) < 40,
          pmod(xxhash64(col("invoiceid"), col("j"), lit(11)), lit(500)))
          .otherwise(lit(1000) +
            pmod(xxhash64(col("invoiceid"), col("j"), lit(13)), lit(50000000L)))
          .cast("string").as("stockcode"))
      .repartition(32).cache()
    val nItems = sales.count()
    val nTail = sales.groupBy("stockcode").count().filter(col("count") < 2).count()
    println(s"fixture: $nItems item rows, $nTail singleton SKUs")

    def time(label: String, prune: Boolean): Unit = {
      def run(): Double = {
        val t0 = System.nanoTime()
        graft.olap.Olap.basketLiftOver(sales, 2, 50, prune)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // untimed warm-up
      println(label + ": " + (1 to 4).map(_ => f"${run()}%.3f").mkString(" "))
    }
    // interleave so neither variant owns the warmer half of the run
    time("unpruned", prune = false)
    time("pruned  ", prune = true)
    time("unpruned", prune = false)
    time("pruned  ", prune = true)

    // identity: the cut must not change a single output row
    val a = graft.olap.Olap.basketLiftOver(sales, 2, 50, prune = false)
    val b = graft.olap.Olap.basketLiftOver(sales, 2, 50, prune = true)
    val d1 = a.exceptAll(b).count(); val d2 = b.exceptAll(a).count()
    println(s"identity: exceptAll ${d1}/${d2} (want 0/0)")
    require(d1 == 0 && d2 == 0, "pruned variant diverged")
    spark.stop()
  }
}
