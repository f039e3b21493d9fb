package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The heap aggregate must BE the row_number window semantics — including
  * ties, short groups, and the partial/merge path across partitions. */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("g").orderBy(col("s").desc, col("id"))
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("g"), col("rank").cast("long").as("rank"),
        col("s").as("score"), col("id"))
  }

  test("equals the window formulation on random data with heavy ties") {
    val rnd = new scala.util.Random(41)
    // scores from a tiny domain force tie-breaking through the id order
    val df = (1 to 20000)
      .map(i => (rnd.nextInt(7).toString, rnd.nextInt(5).toLong, i.toLong))
      .toDF("g", "s", "id")
      .repartition(13) // force partial heaps + merge
    val heap = TopK.perGroup(df, Seq("g"), col("s"), col("id"), 10)
      .select("g", "rank", "score", "id").as[(String, Long, Long, Long)].collect().toSet
    val window = windowTopK(df, 10)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(heap === window)
    assert(heap.nonEmpty)
  }

  test("groups smaller than k return all their rows, ranked") {
    val df = Seq(("a", 5L, 1L), ("a", 9L, 2L), ("b", 1L, 3L)).toDF("g", "s", "id")
    val out = TopK.perGroup(df, Seq("g"), col("s"), col("id"), 10)
      .select("g", "rank", "score", "id").as[(String, Long, Long, Long)].collect().toSet
    assert(out === Set(("a", 1L, 9L, 2L), ("a", 2L, 5L, 1L), ("b", 1L, 1L, 3L)))
  }

  test("null scores and null ids are ignored, not ranked") {
    val df = Seq(
      (Some("a"), Some(5L), Some(1L)), (Some("a"), None, Some(2L)),
      (Some("a"), Some(7L), None)
    ).toDF("g", "s", "id")
    val out = TopK.perGroup(df, Seq("g"), col("s"), col("id"), 3)
      .select("rank", "score", "id").as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 5L, 1L)))
  }

  test("the plan is an aggregate, not a window: no Sort over the raw rows") {
    val df = (1 to 100).map(i => ((i % 3).toString, i.toLong, i.toLong)).toDF("g", "s", "id")
    val plan = TopK.perGroup(df, Seq("g"), col("s"), col("id"), 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"top-k planned a window:\n$plan")
    assert(plan.contains("topk_rows"), s"heap aggregate missing from plan:\n$plan")
  }
}
