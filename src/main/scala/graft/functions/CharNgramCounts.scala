package graft.functions

import java.util.Comparator

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row character-n-gram frequency profile in ONE text scan, returned
  * ALREADY SORTED by (count DESC, gram ASC binary) — so a document's
  * Cavnar-Trenkle rank profile is `slice(result, 1, k)` with rank =
  * position + 1, entirely in-row: no per-occurrence explode, no
  * (doc, gram) aggregate, no per-doc rank window.
  *
  * Semantics match `transform(sequence(1, length(t)-n+1), i ->
  * substr(t, i, n))` counted per gram then ordered `count DESC, gram
  * ASC`: grams are n consecutive CODE POINTS (byte-sliced via a single
  * offset walk — substr/length in both Spark and DuckDB count code
  * points, and byte-wise UTF-8 order equals code-point order, so the
  * ASC tie-break matches both engines' binary collation). Rows shorter
  * than n code points return an EMPTY array — the expression is total,
  * so speculative pre-filter evaluation can never throw.
  */
object CharNgramCounts {

  private final val entryCmp: Comparator[(UTF8String, Long)] =
    new Comparator[(UTF8String, Long)] {
      override def compare(a: (UTF8String, Long), b: (UTF8String, Long)): Int = {
        val c = java.lang.Long.compare(b._2, a._2) // count DESC
        if (c != 0) c else a._1.compareTo(b._1)    // gram ASC (binary)
      }
    }

  /** The raw gram→count map of one row — shared by the sorted-profile
    * expression below and the group-wide [[GramProfileAgg]]. Empty map
    * for rows shorter than n code points. */
  def gramMap(s: UTF8String, n: Int): java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long]()
    val bytes = s.getBytes
    val len = bytes.length
    // one walk to collect each code point's starting byte offset
    val nChars = s.numChars()
    if (nChars < n) return m
    val offs = new Array[Int](nChars + 1)
    var i = 0
    var idx = 0
    while (i < len) {
      offs(idx) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      idx += 1
    }
    offs(nChars) = len
    var g = 0
    val grams = nChars - n + 1
    while (g < grams) {
      val b0 = offs(g)
      val gram = UTF8String.fromBytes(bytes, b0, offs(g + n) - b0)
      val prev = m.get(gram)
      m.put(gram, if (prev eq null) java.lang.Long.valueOf(1L)
        else java.lang.Long.valueOf(prev.longValue() + 1L))
      g += 1
    }
    m
  }

  def counts(s: UTF8String, n: Int): ArrayData = {
    val m = gramMap(s, n)
    val entries = new Array[(UTF8String, Long)](m.size)
    val it = m.entrySet().iterator()
    var e = 0
    while (it.hasNext) {
      val kv = it.next()
      entries(e) = (kv.getKey, kv.getValue)
      e += 1
    }
    java.util.Arrays.sort(entries, entryCmp)
    val out = new Array[Any](entries.length)
    e = 0
    while (e < entries.length) {
      out(e) = InternalRow(entries(e)._1, entries(e)._2)
      e += 1
    }
    new GenericArrayData(out)
  }

  def char_ngram_counts(c: Column, n: Int): Column =
    GraftShims.column(CharNgramCountsExpr(GraftShims.expression(c), n))
}

/** `char_ngram_counts(text, n)` → `array<struct<g: string, c: bigint>>`
  * sorted by (c DESC, g ASC) — see [[CharNgramCounts.counts]]. */
case class CharNgramCountsExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "n must be >= 1")
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("g", StringType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_ngram_counts requires STRING input, got ${child.dataType.catalogString}")
  override def nullSafeEval(v: Any): Any =
    CharNgramCounts.counts(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharNgramCounts.counts($c, $n);")
  override protected def withNewChildInternal(c: Expression): CharNgramCountsExpr =
    copy(child = c)
}
