package org.apache.spark.sql.graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native k-way MinHash signature of a shingle array: element h is
  * `min(md5(h || ":" || shingle))` over the shingles, as lowercase hex —
  * exactly the per-hash minimum the explode + `groupBy(doc).agg(min(md5))`
  * stage computes, byte-for-byte (unsigned digest order ≡ hex string order).
  *
  * The exploded formulation keeps md5 codegen'd but pays a row explosion and
  * a shuffle moving k hashes per document; the `array_min(transform(...))`
  * fold avoids the shuffle but runs interpreted (HOFs are CodegenFallback).
  * This kernel gets both: one codegen'd call per document, all k minima in a
  * single pass, zero extra rows and zero shuffle — the same treatment
  * [[SimHash64]]/[[FloatVecDot]] give the other hot kernels. */
case class MinHashSigs(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    MinHashKernel.compute(a.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.MinHashKernel.compute($c, $numHashes);")

  override def prettyName: String = "minhash_sigs"

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

object MinHashKernel {

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  // the k prefix byte arrays ("0:", "1:", …) are identical for every row of
  // an expression with the same k — building them per row was a per-row
  // allocation (format + UTF-8 encode × k) in a kernel whose whole point is
  // per-row throughput
  private val prefixCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()

  private def prefixesFor(k: Int): Array[Array[Byte]] =
    prefixCache.computeIfAbsent(k,
      kk => Array.tabulate(kk)(h => s"$h:".getBytes(StandardCharsets.UTF_8)))

  private val hexChars = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(i * 2) = hexChars((d(i) >> 4) & 0xF).toByte
      out(i * 2 + 1) = hexChars(d(i) & 0xF).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Unsigned byte-wise less-than — the digest order whose hex rendering is
    * lexicographically smallest (hex digits are monotone in nibble value). */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xFF
      val y = b(i) & 0xFF
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** Empty input yields an empty signature array (the pipeline filters
    * shingle-less docs out before signing, matching the oracle). */
  def compute(shingles: ArrayData, k: Int): ArrayData = {
    val n = shingles.numElements()
    val prefixes = prefixesFor(k)
    val mins = new Array[Array[Byte]](k)
    val md = digests.get()
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i).getBytes
      var h = 0
      while (h < k) {
        md.reset()
        md.update(prefixes(h))
        md.update(s)
        val d = md.digest()
        if (mins(h) == null || less(d, mins(h))) mins(h) = d
        h += 1
      }
      i += 1
    }
    if (n == 0) new GenericArrayData(Array.empty[Any])
    else new GenericArrayData(mins.map(hex(_): Any))
  }
}
