package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group uniform TERM-occurrence sample: keep the k
  * occurrences whose 60-bit sample key ([[graft.operators.Sketches
  * .hash60]] of a unique occurrence id) is SMALLEST, carrying the term
  * string as payload — the categorical twin of [[BottomKSampleAgg]]
  * (same semilattice, String payload instead of Double).
  *
  * A bottom-k set over a uniform hash is a uniform-without-replacement
  * sample of the occurrences, so the count of term t inside the sample
  * is Hypergeometric(n, n·f_t, k) and s_cnt/k estimates the frequency
  * share f_t with additive error O(sqrt(1/k)) — the sampled
  * heavy-hitters estimator (the streaming shape of what the batch
  * q89 two-pass form verifies exactly). Unlike SpaceSaving/Misra-Gries
  * at the same state size, whose counter contents depend on merge
  * ORDER (two partition counts produce different summaries), a
  * bottom-k set is a pure function of the input multiset: reduce and
  * merge are associative + commutative, so the result is
  * repartition-invariant and micro-batch-split-invariant BIT FOR BIT —
  * the invariant this repo's CPUS=4-vs-9 dumps and streaming parity
  * specs gate on.
  *
  * Scale: the buffer is a sorted array of ≤ k (hash, term) pairs;
  * Spark runs it as a partial aggregation, so each map task ships one
  * k-bounded buffer per group instead of shuffling every occurrence.
  * Ordering is (hash ASC, term ASC): a full tie makes the rows
  * interchangeable, so selection is total and deterministic. */
object BottomKTermSampleAgg {
  def columnAgg(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new BottomKTermSampleAgg(k),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING))
}

class BottomKTermSampleAgg(k: Int)
  extends Aggregator[(Long, String), Array[(Long, String)], Array[(Long, String)]] {
  require(k >= 1, "bottom-k sample needs k >= 1")

  /** true if (ha, ta) orders strictly before (hb, tb): smaller hash
    * first, then lexicographic (UTF-8 binary) order on the term. */
  private def before(ha: Long, ta: String, hb: Long, tb: String): Boolean =
    ha < hb || (ha == hb && ta.compareTo(tb) < 0)

  override def zero: Array[(Long, String)] = Array.empty

  override def reduce(buf: Array[(Long, String)],
                      v: (Long, String)): Array[(Long, String)] = {
    if (buf.length == k && !before(v._1, v._2, buf(k - 1)._1, buf(k - 1)._2)) buf
    else {
      var ins = buf.length
      while (ins > 0 && before(v._1, v._2, buf(ins - 1)._1, buf(ins - 1)._2)) ins -= 1
      val n = math.min(buf.length + 1, k)
      val out = new Array[(Long, String)](n)
      System.arraycopy(buf, 0, out, 0, ins)
      out(ins) = v
      System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
      out
    }
  }

  override def merge(a: Array[(Long, String)],
                     b: Array[(Long, String)]): Array[(Long, String)] = {
    val out = new Array[(Long, String)](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < out.length) {
      val takeA = j >= b.length ||
        (i < a.length && before(a(i)._1, a(i)._2, b(j)._1, b(j)._2))
      if (takeA) { out(n) = a(i); i += 1 } else { out(n) = b(j); j += 1 }
      n += 1
    }
    out
  }

  override def finish(buf: Array[(Long, String)]): Array[(Long, String)] = buf

  override def bufferEncoder: Encoder[Array[(Long, String)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Long, String)]]()
  override def outputEncoder: Encoder[Array[(Long, String)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Long, String)]]()
}
