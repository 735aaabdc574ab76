package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftShims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document character-entropy statistics in ONE pass over the string:
  * `struct(mu_sum, n_distinct)` where `mu_sum` is the sum over distinct
  * characters of `round(-(cnt/len) * ln(cnt/len) * 1e9)` (integer nano-nats)
  * and `n_distinct` the distinct-character count.
  *
  * This is the native form of q86's explode-per-char pipeline
  * (`explode(split(text, '')) -> groupBy(doc, ch).count -> per-char mu ->
  * sum`), which shuffles one row per CHARACTER of the corpus (7.5M rows at
  * sf0.1) to compute a per-document scalar. Here the frequency table lives
  * in-row and the only shuffle left is none at all — the operator becomes a
  * narrow projection.
  *
  * Arithmetic is replicated EXACTLY, term by term, so results are
  * bit-identical to the SQL formulation on both engines:
  *  - `len` = code-point count (Spark `length`, DuckDB `length`),
  *  - `p = cnt/len` the same double division,
  *  - `-(p) * Math.log(p) * 1e9` with the same association
  *    (`(-(p) * ln(p)) * 1e9`),
  *  - rounding via `BigDecimal.valueOf(x).setScale(0, HALF_UP)` — the exact
  *    algorithm of Spark's `round(double)`, which goes through the shortest
  *    decimal representation (NOT `Math.round`),
  *  - per-char terms are summed as longs — order-free, any iteration order.
  * Characters are Unicode code points (matches `split(text, '')` on BMP
  * text; the corpora are BMP-only).
  */
case class CharEntropyStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("mu_sum", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_entropy_stats requires STRING input, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any =
    CharEntropyStats.stats(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharEntropyStats.stats($c);")

  override protected def withNewChildInternal(c: Expression): CharEntropyStats =
    copy(child = c)
}

object CharEntropyStats {
  /** Spark's `round(x, 0)` for doubles: shortest-decimal BigDecimal HALF_UP. */
  private def sparkRound(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  def stats(s: UTF8String): InternalRow = {
    val str = s.toString
    val len = s.numChars().toDouble
    // code point -> count; open hash on the code point value
    val counts = new java.util.HashMap[Integer, Integer]()
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      counts.merge(cp, 1, (a, b) => a + b)
      i += Character.charCount(cp)
    }
    var mu = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().toDouble / len
      mu += sparkRound(-p * Math.log(p) * 1e9)
    }
    InternalRow(mu, counts.size().toLong)
  }

  def char_entropy_stats(c: Column): Column =
    GraftShims.column(CharEntropyStats(GraftShims.expression(c)))
}
