package org.apache.spark.sql.graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 16-bit SimHash of a space-tokenized text column.
  *
  * Bit-identical to the composable formulation in `TextOps` (split on a
  * single space with trailing empties kept, md5 per word, bit j set iff the
  * ±1 sum over the j-th hex digit's high bit is positive) and to the DuckDB
  * oracle — but the composable form folds a `transform`/`aggregate` HOF tree
  * per word per bit in interpreted eval (HOFs are CodegenFallback). This
  * expression does the whole signature in one tight JVM kernel per row and
  * stays inside whole-stage codegen, the same treatment [[FloatVecDot]] gives
  * the embedding kernels (SURVEY.md §2 preference (b)).
  */
case class SimHash16(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = StringType

  override def nullSafeEval(s: Any): Any =
    SimHashKernel.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.SimHashKernel.compute($c);")

  override def prettyName: String = "simhash16"

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}

/** The per-row kernel, shared by interpreted eval and generated code. */
object SimHashKernel {

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** `split(text, " ")` keeps trailing empty tokens (regex split, limit -1) —
    * the exact word list the composable formulation hashes. Only the top 8
    * digest bytes matter: hex digit j is "high" iff nibble j's top bit is
    * set. */
  def compute(s: UTF8String): UTF8String = {
    val words = s.toString.split(" ", -1)
    val sums = new Array[Int](16)
    val md = digests.get()
    var w = 0
    while (w < words.length) {
      md.reset()
      val h = md.digest(words(w).getBytes(StandardCharsets.UTF_8))
      var j = 0
      while (j < 16) {
        val nibble = if ((j & 1) == 0) (h(j >> 1) >> 4) & 0xF else h(j >> 1) & 0xF
        sums(j) += (if ((nibble & 8) != 0) 1 else -1)
        j += 1
      }
      w += 1
    }
    val out = new Array[Byte](16)
    var j = 0
    while (j < 16) {
      out(j) = if (sums(j) > 0) '1'.toByte else '0'.toByte
      j += 1
    }
    UTF8String.fromBytes(out)
  }
}
