package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Distributed SimHash: aggregates the 64 bit-vote counters of
  * [[SimHash64]] across ROWS, so a document that arrives chunked (the normal
  * shape at 100 TB — one row per page/segment) gets the exact same simhash as
  * if its token stream were in one row. Votes are associative + commutative,
  * so Spark's partial aggregation (map-side combine) applies and the result
  * is independent of row order and partitioning.
  *
  * Built on the public `Aggregator[IN, BUF, OUT]` API (no private Spark
  * internals); register per-session via `udaf(SimHashAgg)` or use the typed
  * column on a KeyValueGroupedDataset.
  */
object SimHashAgg extends Aggregator[Seq[String], Array[Int], Long] {

  override def zero: Array[Int] = new Array[Int](64)

  override def reduce(votes: Array[Int], tokens: Seq[String]): Array[Int] = {
    if (tokens != null) {
      tokens.foreach { t =>
        if (t != null) {
          val h = SimHash64.fnv1a(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          var j = 0
          while (j < 64) {
            votes(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
            j += 1
          }
        }
      }
    }
    votes
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var j = 0
    while (j < 64) { a(j) += b(j); j += 1 }
    a
  }

  override def finish(votes: Array[Int]): Long = {
    var out = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  override def bufferEncoder: Encoder[Array[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
