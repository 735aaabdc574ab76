package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group uniform row sample: keep the k rows whose 60-bit
  * sample key (md5-fold of a unique row id — [[graft.operators.Sketches
  * .hash60]]) is SMALLEST, carrying one double payload per kept row.
  * This is the rank-sketch twin of KMV's distinct sketch: a bottom-k
  * set over a uniform hash is a uniform-without-replacement sample of
  * the rows, so the sample's empirical CDF estimates every quantile at
  * once with DKW rank error sup|F̂−F| ≤ sqrt(ln(2/δ)/(2k)) — ~0.051 at
  * k=1024, δ=0.01 — with NO declared value range (the property the
  * 256-bin histogram (q107) cannot offer: its bins need [lo, hi] up
  * front, which a stream doesn't get).
  *
  * Why this and not KLL/t-digest at the same state size: their
  * compactions are merge-ORDER-dependent (KLL's coin flips, t-digest's
  * centroid greediness), so two runs with different partition counts
  * produce different sketches — breaking this repo's byte-identical
  * CPUS=4-vs-9 dump invariant and any exact SQL oracle. A bottom-k set
  * is a semilattice (bottom-k of a union = merge of bottom-ks), so the
  * result is a pure function of the input MULTISET: deterministic,
  * repartition-invariant, and exactly replayable in DuckDB as
  * `row_number() OVER (ORDER BY hash, value) <= k`. The price is DKW's
  * O(sqrt(1/k)) rank error vs KLL's O(log^1.5(n)/k) — documented, and
  * gated per group by the q317 error-band audit column.
  *
  * Scale: the buffer is a sorted array of ≤ k (hash, value) pairs;
  * reduce/merge are associative + commutative, so Spark runs it as a
  * partial aggregation — each map task ships one k-bounded buffer per
  * group instead of sort-shuffling every row the way percentile() must.
  * Ordering is (hash ASC, value ASC): hash collisions across distinct
  * rows are ~2^-60, and a (hash, value) tie makes the rows
  * interchangeable, so selection is total and deterministic. */
object BottomKSampleAgg {
  def columnAgg(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new BottomKSampleAgg(k),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaDouble))
}

class BottomKSampleAgg(k: Int)
  extends Aggregator[(Long, Double), Array[(Long, Double)], Array[(Long, Double)]] {
  require(k >= 1, "bottom-k sample needs k >= 1")

  private def norm(v: Double): Double = if (v == 0.0) 0.0 else v

  /** true if (ha, va) orders strictly before (hb, vb): smaller hash
    * first, then Spark SQL double ASC order on the payload. */
  private def before(ha: Long, va: Double, hb: Long, vb: Double): Boolean =
    ha < hb || (ha == hb && java.lang.Double.compare(norm(va), norm(vb)) < 0)

  override def zero: Array[(Long, Double)] = Array.empty

  override def reduce(buf: Array[(Long, Double)],
                      v: (Long, Double)): Array[(Long, Double)] = {
    if (buf.length == k && !before(v._1, v._2, buf(k - 1)._1, buf(k - 1)._2)) buf
    else {
      var ins = buf.length
      while (ins > 0 && before(v._1, v._2, buf(ins - 1)._1, buf(ins - 1)._2)) ins -= 1
      val n = math.min(buf.length + 1, k)
      val out = new Array[(Long, Double)](n)
      System.arraycopy(buf, 0, out, 0, ins)
      out(ins) = v
      System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
      out
    }
  }

  override def merge(a: Array[(Long, Double)],
                     b: Array[(Long, Double)]): Array[(Long, Double)] = {
    val out = new Array[(Long, Double)](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < out.length) {
      val takeA = j >= b.length ||
        (i < a.length && before(a(i)._1, a(i)._2, b(j)._1, b(j)._2))
      if (takeA) { out(n) = a(i); i += 1 } else { out(n) = b(j); j += 1 }
      n += 1
    }
    out
  }

  override def finish(buf: Array[(Long, Double)]): Array[(Long, Double)] = buf

  override def bufferEncoder: Encoder[Array[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Long, Double)]]()
  override def outputEncoder: Encoder[Array[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Long, Double)]]()
}
