package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass MinHash signature sketch over a token array: for each of
  * `draws` hash functions, the minimum over all word k-shingles of the
  * corresponding 4-hex-char slice of the shingle's md5.
  *
  * Produces EXACTLY `array_min(transform(shingles, s -> substring(md5(s),
  * d*4+1, 4)))` for each draw d — the form a SQL oracle can mirror — but in
  * one traversal with no intermediate shingle/hash arrays (the composed
  * higher-order-function pipeline materializes both and was the dominant cost
  * of MinHash-LSH dedup). Duplicate shingles need no dedup: they cannot
  * change a minimum. Returns null when the doc has fewer than k tokens.
  *
  * Eval-only (CodegenFallback): the expression is itself one tight loop per
  * row; codegen would only inline the loop it already is. */
case class MinHashSigs(child: Expression, k: Int, draws: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1 && draws >= 1 && draws <= 8, "md5 yields 8 4-hex-char draws")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs requires ARRAY<STRING>, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < k) return null
    val md = MinHashSigs.digest.get()
    val mins = Array.fill(draws)(Int.MaxValue)
    val space = Array(' '.toByte)
    var i = 0
    while (i <= n - k) {
      // null tokens are skipped WITH their separator — the same shingle
      // string concat_ws(' ', ...) builds in the exact-verification stage
      var j = 0
      var wrote = false
      while (j < k) {
        if (!arr.isNullAt(i + j)) {
          if (wrote) md.update(space)
          md.update(arr.getUTF8String(i + j).getBytes)
          wrote = true
        }
        j += 1
      }
      val dg = md.digest() // also resets the digest for the next shingle
      var d = 0
      while (d < draws) {
        val value = ((dg(2 * d) & 0xff) << 8) | (dg(2 * d + 1) & 0xff)
        if (value < mins(d)) mins(d) = value
        d += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(m => UTF8String.fromString(f"$m%04x")): Array[Any])
  }

  override protected def withNewChildInternal(c: Expression): MinHashSigs = copy(child = c)
}

object MinHashSigs {
  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def minhash_sigs(tokens: Column, k: Int, draws: Int): Column =
    GraftShims.column(MinHashSigs(GraftShims.expression(tokens), k, draws))
}
