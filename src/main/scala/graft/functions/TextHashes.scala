package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftShims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for document fingerprinting — codegen'd so they
  * stay inside whole-stage codegen on the 100 TB hot path (no Scala-UDF
  * serialization boundary).
  *
  * Capability derives from the LLM-pipeline extension requirements (document
  * fingerprinting / near-dup detection); the reference itself has no UDFs
  * (SURVEY.md §2.9).
  */

/** Polynomial rolling hash over a string's UTF-8 bytes:
  * h = Σ h*BASE + byte, in unsigned 64-bit wraparound arithmetic.
  * Deterministic across JVMs/partitions (no object hashCode involved). */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  // Manual type check — ExpectsInputTypes/AbstractDataType are private[sql]
  // in Spark 4.x, so input validation is spelled out here instead.
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires STRING input, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    var h = 1469598103934665603L // arbitrary fixed odd seed (stable across JVMs)
    var i = 0
    while (i < bytes.length) { h = h * 1000003L + (bytes(i) & 0xffL); i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 1469598103934665603L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = $h * 1000003L + ($bytes[$i] & 0xffL);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): RollingHash = copy(child = c)
}

/** 64-bit SimHash over an array of string tokens: each token is hashed
  * (FNV-1a over UTF-8 bytes), each hash votes ±1 per bit, result bit j is 1
  * iff the vote is positive. Hamming-close simhashes ⇒ similar token
  * multisets — the standard near-dup sketch. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires ARRAY<STRING> input, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = SimHash64.fnv1a(arr.getUTF8String(i).getBytes)
        var j = 0
        while (j < 64) { votes(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1); j += 1 }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |int[] $votes = new int[64];
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  if (!$c.isNullAt($i)) {
         |    long $h = graft.functions.SimHash64.fnv1a($c.getUTF8String($i).getBytes());
         |    for (int $j = 0; $j < 64; $j++) {
         |      $votes[$j] += ((($h >>> $j) & 1L) == 1L) ? 1 : -1;
         |    }
         |  }
         |}
         |long $out = 0L;
         |for (int $j = 0; $j < 64; $j++) { if ($votes[$j] > 0) $out |= (1L << $j); }
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

object SimHash64 {
  /** FNV-1a 64-bit — trivial, stable, and callable from generated code. */
  def fnv1a(bytes: Array[Byte]): Long = {
    var h = -3750763034362895579L // 0xcbf29ce484222325
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xffL)) * 1099511628211L; i += 1 }
    h
  }
}

object TextHashes {
  def rolling_hash(c: Column): Column =
    GraftShims.column(RollingHash(GraftShims.expression(c)))
  def simhash64(c: Column): Column =
    GraftShims.column(SimHash64(GraftShims.expression(c)))
}
