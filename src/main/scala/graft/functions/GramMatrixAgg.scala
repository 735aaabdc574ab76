package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One-pass Gram/covariance accumulator over fixed-dimension quantized
  * vectors: the buffer packs `[n, s_0..s_{d-1}, p_0..p_{T-1}]` where `s_i` is
  * the component sum, `p` the upper-triangular sums of pairwise products
  * (`T = d(d+1)/2`, row-major `k = i*d - i(i-1)/2 + (j-i)` for `i <= j`), and
  * `n` the vector count.
  *
  * Scale design: covariance of an n-row, d-dim embedding table is the
  * textbook case for map-side combine — the naive declarative plan
  * (posexplode twice, self-join on row id, groupBy (i,j)) shuffles `n*d²/2`
  * rows, which at 100 TB is a larger shuffle than the input itself. This
  * Aggregator keeps O(d²) longs per task (d=64 → 2145 longs ≈ 17 KB),
  * merges associatively, and ships ONE buffer per partition; the d²-row
  * result materializes only after the final merge. Same pattern Spark itself
  * uses for `covar_pop`, generalized to the full matrix in one pass instead
  * of d² separate covar_pop calls (which would each re-scan the input).
  *
  * Determinism: inputs are micro-unit quantized BIGINTs (see
  * `MlOps.embeddingCovariance`), so all sums are exact integer arithmetic —
  * independent of row order, partitioning, and engine; a SQL oracle
  * reproduces the matrix bit-for-bit.
  *
  * Overflow headroom: with |x| <= 1 quantized at 1e6, each product is
  * <= 1e12, so a Long safely accumulates ~9e6 rows per partition and the
  * DECIMAL(38,0) final combination is exact to ~1e38. For corpora beyond
  * ~10M rows per partition, quantize at 1e4 (documented knob) or split
  * partitions — the buffer stays O(d²) either way.
  */
class GramMatrixAgg(d: Int) extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
  require(d >= 1, "dimension must be positive")
  private val tri = d * (d + 1) / 2

  override def zero: Array[Long] = new Array[Long](1 + d + tri)

  override def reduce(buf: Array[Long], v: Seq[Long]): Array[Long] = {
    require(v.length == d, s"expected dim $d, got ${v.length}")
    val a = v.toArray
    buf(0) += 1L
    var i = 0
    var k = 1 + d
    while (i < d) {
      buf(1 + i) += a(i)
      var j = i
      while (j < d) {
        buf(k) += a(i) * a(j)
        k += 1
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
