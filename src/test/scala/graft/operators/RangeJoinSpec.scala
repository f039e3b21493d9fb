package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics + plan shape of the bucketized point-in-interval join. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("half-open boundaries: t == lo matches, t == hi does not") {
    val pts = Seq((1L, 100L), (2L, 200L), (3L, 99L)).toDF("id", "t")
    val ivs = Seq(("a", 100L, 200L)).toDF("name", "lo", "hi")
    val out = RangeJoin.pointInInterval(pts, ivs, "t", "lo", "hi", 50L)
      .select("id").as[Long].collect().toSet
    assert(out === Set(1L)) // 200 == hi excluded, 99 < lo excluded
  }

  test("an interval spanning many buckets matches a contained point exactly once") {
    val pts = Seq((1L, 500L)).toDF("id", "t")
    val ivs = Seq(("wide", 0L, 1000L)).toDF("name", "lo", "hi")
    val out = RangeJoin.pointInInterval(pts, ivs, "t", "lo", "hi", 10L)
    assert(out.count() === 1) // 100 bucket copies, one containing-bucket match
  }

  test("bucketized result equals the naive cross-join filter on random data") {
    val rnd = new scala.util.Random(7)
    val pts = (1 to 200).map(i => (i.toLong, rnd.nextInt(10000).toLong)).toDF("id", "t")
    val ivs = (1 to 50).map { i =>
      val lo = rnd.nextInt(10000).toLong; (i.toLong, lo, lo + rnd.nextInt(900).toLong + 1)
    }.toDF("iid", "lo", "hi")
    val bucketed = RangeJoin.pointInInterval(pts, ivs, "t", "lo", "hi", 256L)
      .select("id", "iid").as[(Long, Long)].collect().toSet
    val naive = pts.crossJoin(ivs)
      .filter(col("t") >= col("lo") && col("t") < col("hi"))
      .select("id", "iid").as[(Long, Long)].collect().toSet
    assert(bucketed === naive)
    assert(naive.nonEmpty)
  }

  test("bucket ids stay exact at epoch-ns magnitudes beyond double precision") {
    // ~1.7e18 exceeds double's 2^53 mantissa: floor(t / w) in double can
    // land a tick in the wrong bucket within an ulp of a boundary. The
    // integer `div` form must agree with the naive filter on a grid packed
    // around the boundary.
    val w = 600000000000L
    val boundary = w * 2833333L
    val pts = (-3L to 3L).map(d => (d + 10, boundary + d)).toDF("id", "t")
    val ivs = (-3L to 3L).map(d => (d + 20, boundary + d - 2, boundary + d + 2))
      .toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, ivs, "t", "lo", "hi", w)
      .select("id", "iid").as[(Long, Long)].collect().toSet
    val want = pts.crossJoin(ivs)
      .filter(col("t") >= col("lo") && col("t") < col("hi"))
      .select("id", "iid").as[(Long, Long)].collect().toSet
    assert(got === want)
    assert(want.nonEmpty)
  }

  // -- interval × interval overlap (r11) -----------------------------------

  test("overlap join: half-open semantics — touching intervals do not overlap") {
    val a = Seq((1L, 0L, 10L), (2L, 10L, 20L)).toDF("aid", "alo", "ahi")
    val b = Seq((7L, 10L, 15L)).toDF("bid", "blo", "bhi")
    val out = RangeJoin.intervalOverlap(a, b, "alo", "ahi", "blo", "bhi", 4L)
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    assert(out === Set((2L, 7L))) // [0,10) touches [10,15) only at the boundary
  }

  test("overlap join: a pair sharing many buckets emits exactly once") {
    val a = Seq((1L, 0L, 1000L)).toDF("aid", "alo", "ahi")
    val b = Seq((7L, 500L, 900L)).toDF("bid", "blo", "bhi")
    val out = RangeJoin.intervalOverlap(a, b, "alo", "ahi", "blo", "bhi", 10L)
    assert(out.count() === 1) // 40 shared bucket copies, one emission
  }

  test("overlap join equals the naive cross-join filter; degenerates dropped") {
    val rnd = new scala.util.Random(11)
    val a = (1 to 80).map { i =>
      val lo = rnd.nextInt(10000).toLong
      (i.toLong, lo, lo + rnd.nextInt(700).toLong - 50) // ~7% degenerate hi<=lo
    }.toDF("aid", "alo", "ahi")
    val b = (1 to 60).map { i =>
      val lo = rnd.nextInt(10000).toLong
      (i.toLong, lo, lo + rnd.nextInt(900).toLong + 1)
    }.toDF("bid", "blo", "bhi")
    val bucketed = RangeJoin.intervalOverlap(a, b, "alo", "ahi", "blo", "bhi", 256L)
      .select("aid", "bid").as[(Long, Long)].collect()
    val naive = a.crossJoin(b)
      .filter(col("ahi") > col("alo") && col("bhi") > col("blo") &&
        col("alo") < col("bhi") && col("blo") < col("ahi"))
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    assert(bucketed.toSet === naive)
    assert(bucketed.length === naive.size) // dedup-free: no pair built twice
    assert(naive.nonEmpty)
  }

  test("the keyless range join plans as a hash join on the bucket — no NL join") {
    val events = graft.streaming.EventOps.events(spark, sfDir)
    val df = graft.streaming.EventOps.purchasesInErrorWindows(events)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("Initial Plan").head
    assert(!plan.contains("NestedLoop"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Join"), plan)
  }
}
