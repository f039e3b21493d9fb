package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k heap — the aggregation buffer of [[TopKRows]].
  *
  * Holds at most `k` (score, id) pairs, the current best under
  * "score DESC, id ASC". A plain binary min-heap with the WORST retained
  * element at the root: an incoming pair either replaces the root (when it
  * beats it) or is dropped — O(log k) per row, O(k) memory, independent of
  * group size. Determinism: the id tiebreak makes the retained set and its
  * order a pure function of the input multiset.
  */
final class TopKHeap(val k: Int) {
  require(k > 0, "k must be positive")
  // parallel arrays; size <= k
  val scores = new Array[Long](k)
  val ids = new Array[Long](k)
  var size: Int = 0

  /** true iff (s1,i1) ranks WORSE than (s2,i2) under score DESC, id ASC. */
  @inline private def worse(s1: Long, i1: Long, s2: Long, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  private def siftUp(pos0: Int): Unit = {
    var pos = pos0
    while (pos > 0 && worse(scores(pos), ids(pos), scores((pos - 1) / 2), ids((pos - 1) / 2))) {
      val p = (pos - 1) / 2
      swap(pos, p); pos = p
    }
  }

  private def siftDown(pos0: Int): Unit = {
    var pos = pos0
    var done = false
    while (!done) {
      val l = 2 * pos + 1; val r = l + 1
      var m = pos
      if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == pos) done = true else { swap(pos, m); pos = m }
    }
  }

  @inline private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  def insert(score: Long, id: Long): Unit =
    if (size < k) {
      scores(size) = score; ids(size) = id; size += 1
      siftUp(size - 1)
    } else if (worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id
      siftDown(0)
    }

  /** (score, id) pairs best-first. */
  def sorted: Array[(Long, Long)] = {
    val out = (0 until size).map(i => (scores(i), ids(i))).toArray
    // best first = inverse of the heap's "worse" order
    java.util.Arrays.sort(out, new java.util.Comparator[(Long, Long)] {
      def compare(a: (Long, Long), b: (Long, Long)): Int =
        if (a._1 != b._1) java.lang.Long.compare(b._1, a._1)
        else java.lang.Long.compare(a._2, b._2)
    })
    out
  }
}

/** Top-k rows per group as a native `TypedImperativeAggregate` — the
  * scale-correct alternative to `row_number() OVER (PARTITION BY g ORDER BY
  * s DESC) <= k`.
  *
  * The window formulation shuffles EVERY row of every group and sorts each
  * partition just to discard all but k rows — at 100 TB that is a full-data
  * exchange plus an O(n log n) sort whose output is thrown away. This
  * aggregate keeps a k-bounded heap per group: partial aggregation prunes to
  * at most k pairs per group PER MAP TASK before the exchange, so the
  * shuffle carries `groups × k × maps` pairs instead of every row, and no
  * sort ever runs over raw data. Same output, same determinism (score DESC,
  * id ASC), a fraction of the movement.
  *
  * Output: `array<struct<score long, id long>>`, best-first — explode for
  * the relational form ([[graft.operators.TopK.perGroup]]).
  */
case class TopKRows(
    left: Expression, // score (long)
    right: Expression, // id (long)
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKHeap] with BinaryLike[Expression] {

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val s = left.eval(input)
    val i = right.eval(input)
    if (s != null && i != null) buf.insert(s.asInstanceOf[Long], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = {
    var i = 0
    while (i < other.size) { buf.insert(other.scores(i), other.ids(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKHeap): Any =
    new GenericArrayData(buf.sorted.map { case (s, i) =>
      InternalRow(s, i).asInstanceOf[Any]
    })

  override def serialize(buf: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKHeap(k)
    var i = 0
    while (i < n) { buf.insert(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", LongType), StructField("id", LongType))),
    containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "topk_rows"

  override def withNewMutableAggBufferOffset(offset: Int): TopKRows =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKRows =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TopKRows =
    copy(left = l, right = r)
}
