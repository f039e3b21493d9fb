package org.apache.spark.sql.graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash of a space-tokenized text column.
  *
  * Bit j (1-based) is set iff the ±1 sum over the j-th hex digit's high bit
  * of each word's 64-nibble digest is positive, where the digest is
  * `md5(word) || md5('1:' || word)` — two independent md5 streams giving the
  * 64 nibble positions one md5 (32 nibbles) cannot. Bit-identical to the
  * composable formulation in `TextOps.simhashHof` (split on a single space
  * with trailing empties kept) and to the DuckDB oracle.
  *
  * 64 bits (up from the original 16) is the bucket-capacity fix from VERDICT
  * r6 #2: a 16-bit space tops out at 65k buckets, so a billion-document
  * corpus piles ~15k docs into every bucket and the pair join goes quadratic;
  * 2^64 signatures spread any real corpus, and the 4×16-bit banding in
  * `TextOps.simhashPairs` restores LSH-style candidate generation with
  * perfect recall at Hamming distance ≤ 3.
  *
  * The composable form folds a `transform`/`aggregate` HOF tree per word per
  * bit in interpreted eval (HOFs are CodegenFallback); this expression does
  * the whole signature in one tight JVM kernel per row and stays inside
  * whole-stage codegen, the same treatment [[FloatVecDot]] gives the
  * embedding kernels (SURVEY.md §2 preference (b)).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = StringType

  override def nullSafeEval(s: Any): Any =
    SimHashKernel.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.SimHashKernel.compute($c);")

  override def prettyName: String = "simhash64"

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** The per-row kernel, shared by interpreted eval and generated code. */
object SimHashKernel {

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val Salt = "1:".getBytes(StandardCharsets.UTF_8)

  /** `split(text, " ")` keeps trailing empty tokens (regex split, limit -1) —
    * the exact word list the composable formulation hashes. Hex digit j of a
    * digest is "high" iff nibble j's top bit is set; digits 1-32 come from
    * `md5(word)`, 33-64 from `md5("1:" + word)`. */
  def compute(s: UTF8String): UTF8String = {
    val words = s.toString.split(" ", -1)
    val sums = new Array[Int](64)
    val md = digests.get()
    var w = 0
    while (w < words.length) {
      val wb = words(w).getBytes(StandardCharsets.UTF_8)
      md.reset()
      val h0 = md.digest(wb)
      md.reset()
      md.update(Salt)
      val h1 = md.digest(wb)
      var j = 0
      while (j < 32) {
        val n0 = if ((j & 1) == 0) (h0(j >> 1) >> 4) & 0xF else h0(j >> 1) & 0xF
        sums(j) += (if ((n0 & 8) != 0) 1 else -1)
        val n1 = if ((j & 1) == 0) (h1(j >> 1) >> 4) & 0xF else h1(j >> 1) & 0xF
        sums(32 + j) += (if ((n1 & 8) != 0) 1 else -1)
        j += 1
      }
      w += 1
    }
    val out = new Array[Byte](64)
    var j = 0
    while (j < 64) {
      out(j) = if (sums(j) > 0) '1'.toByte else '0'.toByte
      j += 1
    }
    UTF8String.fromBytes(out)
  }
}
