package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Exactness + pruning behavior of the bloom-pruned semi join. */
class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pruned semi join equals the plain semi join on random data") {
    val rnd = new scala.util.Random(11)
    val left = (1 to 2000).map(i => (i.toLong, s"k${rnd.nextInt(500)}")).toDF("id", "key")
    val right = (1 to 40).map(i => s"k${rnd.nextInt(500)}").toDF("key")
    val pruned = BloomJoin.semiJoinPruned(left, right, "key", expectedItems = 64)
      .select("id", "key").as[(Long, String)].collect().toSet
    val plain = left.join(right, Seq("key"), "left_semi")
      .select("id", "key").as[(Long, String)].collect().toSet
    assert(pruned === plain)
    assert(plain.nonEmpty)
  }

  test("exactness survives an undersized filter (high false-positive rate)") {
    val left = (1 to 1000).map(i => (i.toLong, i.toLong % 97)).toDF("id", "key")
    val right = Seq(3L, 5L).toDF("key")
    // expectedItems=1 under 2 inserts: saturated filter, fpp -> high; the
    // exact semi join must still clear every false positive
    val pruned = BloomJoin.semiJoinPruned(left, right, "key", expectedItems = 1)
      .select("id").as[Long].collect().toSet
    val plain = left.join(right, Seq("key"), "left_semi")
      .select("id").as[Long].collect().toSet
    assert(pruned === plain)
  }

  test("empty build side yields an empty result, not a crash or a full pass") {
    val left = Seq((1L, "a"), (2L, "b")).toDF("id", "key")
    val right = spark.emptyDataset[String].toDF("key")
    assert(BloomJoin.semiJoinPruned(left, right, "key", expectedItems = 8).count() === 0)
  }

  test("the bloom stage actually prunes: non-member rows drop before the join") {
    val left = (1 to 10000).map(i => (i.toLong, s"probe$i")).toDF("id", "key")
    val right = (1 to 20).map(i => s"probe${i * 500}").toDF("key")
    val bloom = BloomJoin.bloomOf(right, "key", expectedItems = 20, fpp = 0.001)
    val surviving = left.filter(BloomJoin.mightContain(bloom, col("key"))).count()
    // 20 true members; at fpp=0.001 the expected false-positive mass over
    // 9980 non-members is ~10 — anything near 10000 means no pruning
    assert(surviving >= 20 && surviving < 200,
      s"bloom pre-filter passed $surviving of 10000 rows")
  }

  test("mightContain never returns a false negative") {
    val keys = (1 to 5000).map(i => s"member$i")
    val right = keys.toDF("key")
    val bloom = BloomJoin.bloomOf(right, "key", expectedItems = 5000, fpp = 0.01)
    val misses = right.filter(!BloomJoin.mightContain(bloom, col("key"))).count()
    assert(misses === 0)
  }
}
