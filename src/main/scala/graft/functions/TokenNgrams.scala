package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass statistics over TOKEN n-gram windows (tokens =
  * `split(text, ' ')`, Spark semantics: consecutive/trailing separators keep
  * their empty tokens).
  *
  * The key identity: splitting on a single space means consecutive tokens
  * are separated by exactly one space, so the k-token shingle
  * `concat_ws(' ', slice(split(text,' '), i, k))` IS the byte span of the
  * original text from token i's first byte to token i+k-1's last byte — no
  * shingle strings ever need building. Distinctness is byte-exact (open-
  * addressed table probing the original buffer, same scheme as
  * [[NgramDistinctCount]]); a space byte (0x20) can never occur inside a
  * multi-byte UTF-8 sequence, so byte scanning is unicode-safe.
  *
  * The interpreted alternatives these replace
  * (`transform(sequence(...), i -> concat_ws(' ', slice(toks, i, k)))` +
  * `array_distinct`/`explode`/corpus-wide `groupBy(doc, gram)`) allocate a
  * token array plus one string per window per row and run outside
  * whole-stage codegen — they were the dominant cost of the repetition
  * filter (q87) and decontamination (q85) at sf0.1.
  */
object TokenNgrams {

  /** Token start byte-offsets: length nTokens+1, `starts(n) = len+1` so
    * window end for tokens [i, i+k) is `starts(i+k) - 1` (drops the
    * trailing separator; the sentinel makes the last window end at len). */
  def tokenStarts(bytes: Array[Byte]): Array[Int] = {
    var n = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') n += 1; i += 1 }
    val starts = new Array[Int](n + 1)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(n) = bytes.length + 1
    starts
  }

  /** Single pass over the k-token windows (token boundaries precomputed by
    * the caller): returns the distinct count, and fills `outHashes` (FNV-1a
    * of each distinct window, first-seen order) and/or `outTop` (max
    * multiplicity of any window) when non-null. */
  private def scan(bytes: Array[Byte], starts: Array[Int], k: Int,
                   outHashes: Array[Long], outTop: Array[Long]): Int = {
    val nTokens = starts.length - 1
    val windows = nTokens - k + 1
    if (windows <= 0) return 0
    var cap = 4
    while (cap < windows * 2) cap <<= 1
    val slots = new Array[Int](cap) // 0 = empty, else (window index + 1)
    val counts = if (outTop != null) new Array[Int](cap) else null
    val mask = cap - 1
    var distinct = 0
    var top = 0L
    var w = 0
    while (w < windows) {
      val b0 = starts(w); val b1 = starts(w + k) - 1
      var h = -3750763034362895579L // FNV-1a over the window's bytes
      var j = b0
      while (j < b1) { h = (h ^ (bytes(j) & 0xffL)) * 1099511628211L; j += 1 }
      var slot = (h.toInt ^ (h >>> 32).toInt) & mask
      var done = false
      while (!done) {
        val e = slots(slot)
        if (e == 0) {
          slots(slot) = w + 1
          if (outHashes != null) outHashes(distinct) = h
          if (counts != null) { counts(slot) = 1; if (top < 1) top = 1 }
          distinct += 1
          done = true
        } else {
          val ew = e - 1
          val e0 = starts(ew); val e1 = starts(ew + k) - 1
          var same = (e1 - e0) == (b1 - b0)
          var m = 0
          while (same && m < b1 - b0) { same = bytes(e0 + m) == bytes(b0 + m); m += 1 }
          if (same) {
            if (counts != null) {
              counts(slot) += 1
              if (counts(slot) > top) top = counts(slot)
            }
            done = true
          } else slot = (slot + 1) & mask
        }
      }
      w += 1
    }
    if (outTop != null) outTop(0) = top
    distinct
  }

  def count(s: UTF8String, k: Int): Long = {
    val bytes = s.getBytes
    scan(bytes, tokenStarts(bytes), k, null, null).toLong
  }

  def hashes(s: UTF8String, k: Int): ArrayData = {
    val bytes = s.getBytes
    val starts = tokenStarts(bytes)
    val windows = math.max(starts.length - 1 - k + 1, 0)
    val out = new Array[Long](windows)
    val n = scan(bytes, starts, k, out, null)
    new GenericArrayData(java.util.Arrays.copyOf(out, n))
  }

  def topCount(s: UTF8String, k: Int): Long = {
    val bytes = s.getBytes
    val top = new Array[Long](1)
    scan(bytes, tokenStarts(bytes), k, null, top)
    top(0)
  }

  /** ALL k-token windows (positional, NOT deduplicated) as FNV-1a hashes
    * of their byte spans — the inventory form for position-aware shingle
    * pipelines (exact-substring dedup): window w of row r is element w,
    * so `posexplode` recovers (start, fingerprint) with no token array,
    * no window strings, no digest. Rows with fewer than k tokens return
    * an EMPTY array — the expression is total, so speculative pre-filter
    * evaluation can never throw. */
  def windowHashes(s: UTF8String, k: Int): ArrayData = {
    val bytes = s.getBytes
    val starts = tokenStarts(bytes)
    val windows = math.max(starts.length - 1 - k + 1, 0)
    val out = new Array[Long](windows)
    var w = 0
    while (w < windows) {
      val b0 = starts(w); val b1 = starts(w + k) - 1
      var h = -3750763034362895579L // FNV-1a offset basis
      var j = b0
      while (j < b1) { h = (h ^ (bytes(j) & 0xffL)) * 1099511628211L; j += 1 }
      out(w) = h
      w += 1
    }
    new GenericArrayData(out)
  }

  def token_ngram_distinct_count(c: Column, n: Int): Column =
    GraftShims.column(TokenNgramDistinctCount(GraftShims.expression(c), n))
  def token_ngram_distinct_hashes(c: Column, n: Int): Column =
    GraftShims.column(TokenNgramDistinctHashes(GraftShims.expression(c), n))
  def token_top_ngram_count(c: Column, n: Int): Column =
    GraftShims.column(TokenTopNgramCount(GraftShims.expression(c), n))
  def token_window_hashes(c: Column, n: Int): Column =
    GraftShims.column(TokenWindowHashes(GraftShims.expression(c), n))
}

private[functions] trait TokenNgramExpr extends UnaryExpression {
  def n: Int
  def fnName: String
  require(n >= 1, "n must be >= 1")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$fnName requires STRING input, got ${child.dataType.catalogString}")
}

/** EXACT count of distinct k-token shingles — native form of
  * `size(array_distinct(transform(..., i -> concat_ws(' ', slice(toks, i, k)))))`. */
case class TokenNgramDistinctCount(child: Expression, n: Int) extends TokenNgramExpr {
  override def fnName: String = "token_ngram_distinct_count"
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    TokenNgrams.count(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenNgrams.count($c, $n);")
  override protected def withNewChildInternal(c: Expression): TokenNgramDistinctCount =
    copy(child = c)
}

/** Distinct k-token shingles as 64-bit FNV-1a hashes (byte-exact
  * distinctness, hashed identity) — the join-key form for shingle-keyed
  * pipelines (decontamination): joins/aggregations move 8-byte longs
  * instead of k-token strings. */
case class TokenNgramDistinctHashes(child: Expression, n: Int) extends TokenNgramExpr {
  override def fnName: String = "token_ngram_distinct_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TokenNgrams.hashes(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenNgrams.hashes($c, $n);")
  override protected def withNewChildInternal(c: Expression): TokenNgramDistinctHashes =
    copy(child = c)
}

/** ALL k-token windows as positional FNV-1a byte-span hashes — see
  * [[TokenNgrams.windowHashes]]. Join identity only (a 64-bit collision
  * merges two windows the way the md5 form's would at 128 bits — the q75
  * hashed-gram-identity precedent). */
case class TokenWindowHashes(child: Expression, n: Int) extends TokenNgramExpr {
  override def fnName: String = "token_window_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TokenNgrams.windowHashes(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenNgrams.windowHashes($c, $n);")
  override protected def withNewChildInternal(c: Expression): TokenWindowHashes =
    copy(child = c)
}

/** Max multiplicity of any k-token shingle (0 when fewer than k tokens) —
  * the "top bigram count" of Gopher-style repetition filters, without the
  * corpus-wide (doc, gram) groupBy or the per-doc sort+fold. */
case class TokenTopNgramCount(child: Expression, n: Int) extends TokenNgramExpr {
  override def fnName: String = "token_top_ngram_count"
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    TokenNgrams.topCount(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenNgrams.topCount($c, $n);")
  override protected def withNewChildInternal(c: Expression): TokenTopNgramCount =
    copy(child = c)
}
