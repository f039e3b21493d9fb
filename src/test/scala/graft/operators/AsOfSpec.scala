package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics of the generic as-of join. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq((1L, "k1", 100L), (2L, "k1", 300L), (3L, "k2", 100L))
    .toDF("id", "k", "t")
  private def right = Seq(("k1", 50L, "a"), ("k1", 200L, "b"), ("k3", 10L, "z"))
    .toDF("k", "t", "v")

  private def run(strict: Boolean) =
    AsOf.asOfJoin(left, right, Seq("k"), "t", "t", strict)
      .select(col("id"), col("asof.v"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap

  test("each left row picks the latest right row at-or-before its time, per key") {
    val out = run(strict = false)
    assert(out === Map(1L -> "a", 2L -> "b", 3L -> null)) // k2 has no rights; k3 unseen
  }

  test("strict mode excludes the same-instant right row; non-strict includes it") {
    val l = Seq((1L, "k", 100L)).toDF("id", "k", "t")
    val r = Seq(("k", 100L, "now"), ("k", 99L, "before")).toDF("k", "t", "v")
    def one(strict: Boolean) = AsOf.asOfJoin(l, r, Seq("k"), "t", "t", strict)
      .select(col("asof.v")).head().getString(0)
    assert(one(strict = false) === "now")
    assert(one(strict = true) === "before")
  }

  test("forward as-of picks the earliest right row at-or-after, per key") {
    val out = AsOf.asOfJoinForward(left, right, Seq("k"), "t", "t")
      .select(col("id"), col("asof.v"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(out === Map(1L -> "b", 2L -> null, 3L -> null)) // 100 → next right at 200
  }

  test("forward strict mode excludes the same-instant right row") {
    val l = Seq((1L, "k", 100L)).toDF("id", "k", "t")
    val r = Seq(("k", 100L, "now"), ("k", 101L, "after")).toDF("k", "t", "v")
    def one(strict: Boolean) = AsOf.asOfJoinForward(l, r, Seq("k"), "t", "t", strict)
      .select(col("asof.v")).head().getString(0)
    assert(one(strict = false) === "now")
    assert(one(strict = true) === "after")
  }

  test("nearest join picks the closer side, prefers earlier on ties, honors tolerance") {
    val l = Seq((1L, "k", 100L), (2L, "k", 210L), (3L, "k", 285L), (4L, "k", 1000L))
      .toDF("id", "k", "t")
    val r = Seq(("k", 140L, "a"), ("k", 280L, "b")).toDF("k", "t", "v")
    val out = AsOf.nearestJoin(l, r, Seq("k"), "t", "t", Some(300L))
      .select(col("id"), col("asof.v"), col("delta_us"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else (r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) === ("a", 40L))   // forward is closer (40 vs nothing behind)
    assert(out(2L) === ("a", 70L))   // EQUAL distance 70 both ways → earlier wins
    assert(out(3L) === ("b", 5L))    // backward is closer
    assert(out(4L) === null)         // nothing within tolerance 300
  }

  test("the as-of plan is one key shuffle — no nested-loop or range join") {
    val df = AsOf.asOfJoin(left, right, Seq("k"), "t", "t", strict = true)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("Initial Plan").head
    assert(!plan.contains("NestedLoop"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1, plan)
  }

  test("window formulation equals the naive range-join + keep-latest on random data") {
    val rnd = new scala.util.Random(11)
    val l = (1 to 150).map(i => (i.toLong, s"k${rnd.nextInt(8)}", rnd.nextInt(1000).toLong))
      .toDF("id", "k", "t")
    // distinct (k, t) on the right so "latest" is unambiguous on both paths
    val r = rnd.shuffle((0 until 1000).toList).take(60).zipWithIndex
      .map { case (t, i) => (s"k${t % 8}", t.toLong, s"v$i") }
      .toDF("k", "t", "v")
    val windowed = AsOf.asOfJoin(l, r, Seq("k"), "t", "t", strict = true)
      .select(col("id"), col("asof.v").as("v"))
      .collect().map(x => x.getLong(0) -> Option(x.getString(1))).toMap
    val naive = l.join(r.select(col("k"), col("t").as("rt"), col("v")), Seq("k"), "left")
      .filter(col("rt").isNull || col("rt") < col("t"))
      .withColumn("rn", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("id").orderBy(col("rt").desc_nulls_last)))
      .filter(col("rn") === 1)
      .collect().map(x => x.getLong(x.fieldIndex("id")) ->
        Option(x.getString(x.fieldIndex("v")))).toMap
    // the naive left join drops rows where every right candidate fails the
    // filter — those lefts simply have no match
    l.select("id").collect().map(_.getLong(0)).foreach { id =>
      assert(windowed.getOrElse(id, None) === naive.getOrElse(id, None), s"left $id")
    }
    assert(windowed.values.flatten.nonEmpty)
  }

  test("matches the events-table instance shape: strictly-prior click per purchase") {
    val events = graft.streaming.EventOps.events(spark, sfDir)
    val out = graft.streaming.EventOps.asofLastClick(events)
    // every purchase appears exactly once, with last_click strictly before it
    val n = events.filter(col("event_type") === "purchase").count()
    assert(out.count() === n)
    assert(out.filter(col("last_click_t") >= col("t")).count() === 0)
  }
}
