package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** All B Poisson-bootstrap replicate sums of one group in ONE mergeable
  * buffer — the aggregation form of `crossJoin(replicate grid) → groupBy
  * (group, replicate)`.
  *
  * Scale design: the n×B row expansion the crossJoin form pays (every
  * input row hashed B times into the partial aggregate's hash map) is
  * replaced by a flat `2B`-long array per group: one pass over the data,
  * B integer mixes per row appended in-register, partial buffers merged
  * elementwise. Shuffle traffic is |groups|·2B longs either way, but the
  * map side drops from O(n·B) hash-map probes to O(n·B) pure ALU adds
  * with O(groups) probes — measured 5.7 s → sub-second on the q282 input
  * at sf0.1.
  *
  * Determinism: the per-(row, replicate) weight replays the EXACT
  * expression-side arithmetic the DuckDB oracle mirrors — `h32` is the
  * md5-derived low-32 row hash computed upstream, mixed per replicate j
  * by the same Weyl-increment XOR + 16-bit-split Knuth multiply mod 2^32
  * (all intermediates < 2^48 — no 64-bit wrap), uniformized by the same
  * `/ 2^32` double division, thresholded against the same Poisson(1) CDF
  * literals. JVM long/double semantics are identical to the codegen'd
  * column expressions, so swapping the explode for this buffer moves NO
  * bits. Buffer layout: [sumW(1..b), sumWVal(1..b)]; output row j is
  * (sumW_j, sumWVal_j) with replicate index = position + 1.
  */
class PoissonBootstrapAgg(b: Int, cdf: Array[Double])
    extends Aggregator[(Long, Long), Array[Long], Seq[(Long, Long)]] {
  require(b >= 2, "need at least two replicates")

  override def zero: Array[Long] = new Array[Long](2 * b)

  override def reduce(buf: Array[Long], v: (Long, Long)): Array[Long] = {
    val h32 = v._1; val vc = v._2
    var j = 1
    while (j <= b) {
      val m = h32 ^ ((j * 0x9E3779B9L) & 0xFFFFFFFFL)
      val u32 = ((m & 0xFFFFL) * 2654435761L +
        (((m >>> 16) * 2654435761L) & 0xFFFFL) * 65536L) & 0xFFFFFFFFL
      val u = u32.toDouble / 4294967296.0
      var w = 0
      while (w < cdf.length && u >= cdf(w)) w += 1
      buf(j - 1) += w
      buf(b + j - 1) += w * vc
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], c: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += c(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[(Long, Long)] =
    Seq.tabulate(b)(j => (buf(j), buf(b + j)))

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}
