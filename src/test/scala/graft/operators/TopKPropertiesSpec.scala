package graft.operators

import org.scalacheck.{Gen, Prop, Properties}

import org.apache.spark.sql.graft.TopKHeap

/** Pure-JVM properties of the bounded heap behind [[TopKRows]] — no Spark
  * session, so these run the full default case count. The reference model
  * is sort-then-take-k over the whole input. */
object TopKPropertiesSpec extends Properties("topk-heap") {

  private def model(pairs: List[(Long, Long)], k: Int): List[(Long, Long)] =
    pairs.sortBy { case (s, i) => (-s, i) }.take(k)

  private val pairGen = for {
    s <- Gen.chooseNum(-5L, 5L) // tiny score domain → constant tie-breaking
    i <- Gen.chooseNum(Long.MinValue + 1, Long.MaxValue)
  } yield (s, i)

  property("insert-only heap equals sort-take-k, any k, heavy ties") =
    Prop.forAll(Gen.listOf(pairGen), Gen.chooseNum(1, 12)) { (pairs, k) =>
      val h = new TopKHeap(k)
      pairs.foreach { case (s, i) => h.insert(s, i) }
      h.sorted.toList == model(pairs, k) // duplicates rank independently
    }

  property("arbitrarily split + merged heaps equal the one-pass heap") =
    Prop.forAll(Gen.listOf(pairGen), Gen.chooseNum(1, 8), Gen.chooseNum(2, 5)) {
      (pairs, k, nSplits) =>
        val one = new TopKHeap(k)
        pairs.foreach { case (s, i) => one.insert(s, i) }
        val merged = pairs.grouped(math.max(1, pairs.size / nSplits + 1))
          .map { chunk =>
            val h = new TopKHeap(k)
            chunk.foreach { case (s, i) => h.insert(s, i) }
            h
          }
          .foldLeft(new TopKHeap(k)) { (acc, h) =>
            (0 until h.size).foreach(j => acc.insert(h.scores(j), h.ids(j)))
            acc
          }
        merged.sorted.toList == one.sorted.toList
    }

  property("serialization-shaped rebuild preserves the retained set") =
    Prop.forAll(Gen.listOf(pairGen), Gen.chooseNum(1, 8)) { (pairs, k) =>
      val h = new TopKHeap(k)
      pairs.foreach { case (s, i) => h.insert(s, i) }
      val rebuilt = new TopKHeap(k)
      (0 until h.size).foreach(j => rebuilt.insert(h.scores(j), h.ids(j)))
      rebuilt.sorted.toList == h.sorted.toList
    }
}
