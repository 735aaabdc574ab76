package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The repo's 60-bit md5-fold hash as ONE native codegen expression:
  * md5 over the input string's UTF-8 bytes, top 60 bits of the digest as
  * a non-negative long — bit-identical to the composed
  * `conv(substring(md5(c), 1, 15), 16, 10)` (the value of the first 15
  * hex digits IS the first 7.5 digest bytes big-endian), which is also
  * what the DuckDB oracle replays. The composed form materializes the
  * 32-char hex string, substrings it, and re-parses 15 chars through
  * NumberConverter per value; this computes the digest once and folds
  * bytes directly — the q320 profiler pays that per (row, column), so
  * the string round-trip was its dominant term.
  *
  * The MessageDigest instance is cached per codegen class / eval thread
  * (md5 digests are reusable via reset); the expression stays inside
  * whole-stage codegen. */
case class Hash60(child: Expression)
  extends UnaryExpression with Serializable {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hash60 requires STRING input, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any =
    Hash60.fold(Hash60.localMd5.get().digest(v.asInstanceOf[UTF8String].getBytes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val md = ctx.addMutableState("java.security.MessageDigest", "hash60Md5",
        n =>
          s"""try { $n = java.security.MessageDigest.getInstance("MD5"); }
             |catch (java.security.NoSuchAlgorithmException e)
             |{ throw new RuntimeException(e); }""".stripMargin)
      val dig = ctx.freshName("dig")
      s"""
         |$md.reset();
         |byte[] $dig = $md.digest($c.getBytes());
         |${ev.value} = graft.functions.Hash60.fold($dig);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Hash60 = copy(child = c)
}

object Hash60 {
  private[functions] val localMd5 =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** First 15 hex digits of the digest as an unsigned value: the first 8
    * bytes big-endian with the low nibble dropped. */
  def fold(d: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h >>> 4
  }

  def hash60(c: Column): Column =
    org.apache.spark.sql.graftshim.GraftShims.column(Hash60(
      org.apache.spark.sql.graftshim.GraftShims.expression(c)))
}
