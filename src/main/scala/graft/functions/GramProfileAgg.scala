package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.unsafe.types.UTF8String

/** Per-group character-n-gram rank profile in ONE pass: aggregates each
  * row's gram counts (the same single-scan counting as
  * [[CharNgramCounts]]) into a group-wide gram→count map, and emits the
  * top-k grams ordered by (count DESC, gram ASC in UTF-8 byte order) —
  * the Cavnar-Trenkle language profile, rank = output position + 1.
  *
  * Scale design: the declarative plan (explode every per-doc gram →
  * (group, gram) aggregate → per-group rank window) shuffles one row
  * per (doc, distinct gram) — orders of magnitude more rows than the
  * input at corpus scale. This Aggregator's buffer is the group's gram
  * map, bounded by the character-n-gram VOCABULARY (Zipf-bounded, ~10⁵
  * even at 100 TB for n=3), merges associatively, and ships one map per
  * (partition, group): classic map-side combine with sketch-sized state.
  * Counts are exact longs, so the result is independent of row order,
  * partitioning, and merge shape.
  *
  * Ordering contract: gram ties sort by UTF-8 BYTE order (==
  * code-point order) via [[UTF8String]] comparison — identical to
  * Spark's string sort and DuckDB's binary collation, including
  * supplementary-plane characters where Java String order diverges. */
class GramProfileAgg(n: Int, k: Int)
    extends Aggregator[String, java.util.HashMap[String, java.lang.Long],
      Seq[(String, Long)]] {
  require(n >= 1 && k >= 1, "need n >= 1 and k >= 1")

  override def zero: java.util.HashMap[String, java.lang.Long] =
    new java.util.HashMap[String, java.lang.Long]()

  override def reduce(buf: java.util.HashMap[String, java.lang.Long],
                      text: String): java.util.HashMap[String, java.lang.Long] = {
    if (text != null) {
      val m = CharNgramCounts.gramMap(UTF8String.fromString(text), n)
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val key = e.getKey.toString
        val prev = buf.get(key)
        buf.put(key, if (prev eq null) e.getValue
          else java.lang.Long.valueOf(prev.longValue() + e.getValue.longValue()))
      }
    }
    buf
  }

  override def merge(a: java.util.HashMap[String, java.lang.Long],
                     b: java.util.HashMap[String, java.lang.Long]):
      java.util.HashMap[String, java.lang.Long] = {
    val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
    val it = small.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val prev = big.get(e.getKey)
      big.put(e.getKey, if (prev eq null) e.getValue
        else java.lang.Long.valueOf(prev.longValue() + e.getValue.longValue()))
    }
    big
  }

  override def finish(buf: java.util.HashMap[String, java.lang.Long]):
      Seq[(String, Long)] = {
    val entries = new Array[(UTF8String, Long)](buf.size)
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (UTF8String.fromString(e.getKey), e.getValue.longValue())
      i += 1
    }
    java.util.Arrays.sort(entries, new java.util.Comparator[(UTF8String, Long)] {
      override def compare(a: (UTF8String, Long), b: (UTF8String, Long)): Int = {
        val c = java.lang.Long.compare(b._2, a._2)
        if (c != 0) c else a._1.compareTo(b._1)
      }
    })
    entries.take(k).toSeq.map { case (g, c) => (g.toString, c) }
  }

  override def bufferEncoder: Encoder[java.util.HashMap[String, java.lang.Long]] =
    Encoders.kryo[java.util.HashMap[String, java.lang.Long]]
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}
