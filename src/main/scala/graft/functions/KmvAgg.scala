package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** K-Minimum-Values distinct-count sketch (Bar-Yossef et al., RANDOM 2002):
  * keep the `k` smallest distinct hash values seen; if fewer than `k` exist
  * the count is exact, otherwise estimate `(k-1) / U_k` where `U_k` is the
  * k-th smallest hash normalized to [0,1).
  *
  * Scale design: the buffer is a bounded sorted array (at most `k` longs), the
  * merge is associative + commutative, so Spark runs it as a partial
  * aggregation — each map task ships one `k`-long sketch per group instead of
  * shuffling every distinct value the way exact `count(DISTINCT)` must. That
  * is the whole point at 100 TB: sketch size is O(k), independent of group
  * size, and sketches for disjoint partitions merge exactly.
  *
  * Determinism: inputs are 60-bit hashes derived from md5 (see
  * `Sketches.kmvDistinct`), so the sketch — and therefore the estimate — is a
  * pure function of the input SET: independent of row order, partitioning,
  * and engine. A SQL oracle reproduces it bit-for-bit.
  */
class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Double] {
  require(k >= 2, "KMV needs k >= 2")

  private val pow2to60 = (1L << 60).toDouble

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], v: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(buf, v)
    if (pos >= 0) buf // already present
    else {
      val ins = -pos - 1
      if (buf.length < k) {
        val out = new Array[Long](buf.length + 1)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = v
        System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
        out
      } else if (ins < k) { // v displaces the current maximum
        val out = new Array[Long](k)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = v
        System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
        out
      } else buf
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    // merge two sorted distinct arrays, keeping the k smallest distinct
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
      val v = if (takeA) a(i) else b(j)
      if (takeA) i += 1 else j += 1
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(buf: Array[Long]): Double =
    if (buf.length < k) buf.length.toDouble
    else ((k - 1).toDouble * pow2to60) / buf(k - 1).toDouble

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
