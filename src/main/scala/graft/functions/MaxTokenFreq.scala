package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native max-token-frequency of a space-tokenized text column — the
  * repetition-filter kernel (`TextOps.repetition` / `filterCascade`).
  *
  * Equal by construction to the composable `aggregate(sort_array(split(...)))`
  * fold in `TextOps.maxTokenFreqHof` (any total order groups equal tokens, so
  * the longest run is collation-independent) and to the DuckDB oracle's
  * per-(doc, token) count — but the HOF tree runs interpreted per row
  * (CodegenFallback), while this kernel is one sort + run-scan inside
  * whole-stage codegen, the [[SimHash64]]/[[FloatVecDot]] treatment for the
  * curation hot path. */
case class MaxTokenFreq(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = LongType

  override def nullSafeEval(s: Any): Any =
    MaxTokenFreqKernel.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.MaxTokenFreqKernel.compute($c);")

  override def prettyName: String = "max_token_freq"

  override protected def withNewChildInternal(newChild: Expression): MaxTokenFreq =
    copy(child = newChild)
}

/** The per-row kernel, shared by interpreted eval and generated code. */
object MaxTokenFreqKernel {

  /** `split(text, " ")` keeps trailing empty tokens (regex split, limit -1) —
    * the exact token list the composable fold sorts. Run lengths over equal
    * elements do not depend on the sort collation. */
  def compute(s: UTF8String): Long = {
    val words = s.toString.split(" ", -1)
    java.util.Arrays.sort(words.asInstanceOf[Array[AnyRef]])
    var best = 1L
    var run = 1L
    var i = 1
    while (i < words.length) {
      if (words(i) == words(i - 1)) {
        run += 1
        if (run > best) best = run
      } else run = 1
      i += 1
    }
    best
  }
}
