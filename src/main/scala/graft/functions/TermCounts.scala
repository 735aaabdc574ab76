package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Occurrence counts of N fixed query terms among a row's whitespace
  * tokens, in ONE byte scan of the text.
  *
  * Semantics match `size(filter(split(text, ' '), x -> x = term))` per
  * term (single-space split, empty tokens kept — harmless since query
  * terms are non-empty). Token identity is byte-exact; a space byte
  * (0x20) never occurs inside a multi-byte UTF-8 sequence, so the scan
  * is unicode-safe.
  *
  * This replaces the fixed-vocabulary TF-IDF scorer's per-term
  * interpreted HOFs (`filter(split(...))` × N, plus
  * `array_contains(split(...))` × N in the corpus-stats aggregate): those
  * run outside whole-stage codegen and re-split the text 2N times per
  * row; this expression is codegen'd and tokenizes once, with the df
  * aggregate derived from `counts(i) > 0`.
  */
object TermCounts {

  /** Per-term occurrence counts over single-space-delimited tokens. */
  def counts(s: UTF8String, terms: Array[Array[Byte]]): ArrayData = {
    val bytes = s.getBytes
    val out = new Array[Long](terms.length)
    val n = bytes.length
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        val len = i - start
        var t = 0
        while (t < terms.length) {
          val tb = terms(t)
          if (tb.length == len) {
            var m = 0
            var same = true
            while (same && m < len) { same = bytes(start + m) == tb(m); m += 1 }
            if (same) out(t) += 1
          }
          t += 1
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def term_counts(c: Column, terms: Seq[String]): Column =
    GraftShims.column(TermCountsExpr(GraftShims.expression(c), terms))
}

/** `term_counts(text, terms...)` → `array<bigint>` of per-term token
  * occurrence counts (terms are plan-time string literals). */
case class TermCountsExpr(child: Expression, terms: Seq[String])
    extends UnaryExpression {
  require(terms.nonEmpty, "term_counts requires at least one term")

  @transient private lazy val termBytes: Array[Array[Byte]] =
    terms.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"term_counts requires STRING input, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any =
    TermCounts.counts(v.asInstanceOf[UTF8String], termBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("terms", termBytes, "byte[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TermCounts.counts($c, $ref);")
  }

  override protected def withNewChildInternal(c: Expression): TermCountsExpr =
    copy(child = c)
}
