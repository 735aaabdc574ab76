package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShims
import org.apache.spark.sql.types._

/** All unordered pairs of a bucket's ids, each packed `min << 32 | max` —
  * the in-row pair-expansion step of bucketed candidate generation.
  *
  * `groupBy(bucket).collect_list(id)` + this expression replaces the classic
  * self-join on the bucket key: ONE shuffle of the (bucket, id) rows instead
  * of two (both join sides), with the quadratic expansion happening in-row
  * on the reduced groups. The df-cap that bounds bucket size for the
  * self-join bounds the output array here identically (n·(n-1)/2 pairs).
  * Ids must be non-negative and < 2^32; elements are assumed distinct
  * within a bucket (set semantics upstream). */
case class PackedPairs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"packed_pairs requires ARRAY<BIGINT>, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    PackedPairs.pairs(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PackedPairs.pairs($c);")

  override protected def withNewChildInternal(c: Expression): PackedPairs =
    copy(child = c)
}

object PackedPairs {
  def pairs(ids: ArrayData): ArrayData = {
    val n = ids.numElements()
    val out = new Array[Long](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val a = ids.getLong(i)
      var j = i + 1
      while (j < n) {
        val b = ids.getLong(j)
        out(k) = if (a < b) (a << 32) | b else (b << 32) | a
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def packed_pairs(c: Column): Column =
    GraftShims.column(PackedPairs(GraftShims.expression(c)))
}
