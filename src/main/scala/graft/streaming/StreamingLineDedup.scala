package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TimeMode, TTLConfig, TimerValues, ValueState}

/** Streaming twin of `TextDedup.lineDedup`'s boilerplate census: as
  * documents stream in, emit each line (non-overlapping `lineTokens`-token
  * tile — the batch operator's line proxy) EXACTLY ONCE, the moment its
  * distinct-document count first reaches `minDocs`. The emitted feed is
  * the live boilerplate list an ingest pipeline subscribes to (downstream
  * writers drop those lines from documents they rewrite — the batch
  * operator's drop set, discovered incrementally).
  *
  * State design — the reason this scales: a line's state is AT MOST
  * `minDocs − 1` doc-id map entries plus a counter and an emitted flag.
  * Below the threshold the doc-id set is needed (within-doc repeats and
  * re-deliveries must not double-count); AT the threshold the map is
  * cleared and only the flag survives, so hot boilerplate lines — the
  * ones seen millions of times — carry ONE boolean of state each. Keyed
  * by line in the RocksDB state store (transformWithState's provider),
  * partitioned by the stream's key hash; no global structure.
  *
  * Determinism: the emitted SET over a full stream is micro-batch-split
  * invariant (distinct-doc counting is order-free; within a batch a key's
  * rows are buffer-sorted by doc_id so the crossing row — and the state
  * left behind — never depends on shuffle arrival order). Emission TIMING
  * (which batch) naturally depends on the split, as with every streaming
  * threshold monitor here; the spec pins the set. */
object StreamingLineDedup {

  final case class Doc(doc_id: Long, text: String)
  final case class LineOcc(line: String, doc_id: Long)
  final case class Boilerplate(line: String, n_docs: Long)

  class Processor(minDocs: Int)
      extends StatefulProcessor[String, LineOcc, Boilerplate] {
    @transient private var emitted: ValueState[Boolean] = _
    @transient private var docs: MapState[Long, Boolean] = _
    @transient private var n: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      emitted = getHandle.getValueState("emitted",
        Encoders.scalaBoolean, TTLConfig.NONE)
      docs = getHandle.getMapState("docs",
        Encoders.scalaLong, Encoders.scalaBoolean, TTLConfig.NONE)
      n = getHandle.getValueState("n", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[LineOcc],
                                 timers: TimerValues): Iterator[Boilerplate] = {
      if (emitted.exists()) return Iterator.empty
      // buffer-sort one key's batch slice by doc_id: the crossing point
      // (and the residual sub-threshold state) must not depend on shuffle
      // arrival order — the StatefulFirstSeen discipline
      val ordered = rows.toArray.sortBy(_.doc_id)
      var out: Option[Boilerplate] = None
      var i = 0
      while (i < ordered.length && out.isEmpty) {
        val d = ordered(i).doc_id
        if (!docs.containsKey(d)) {
          val cnt = (if (n.exists()) n.get() else 0L) + 1L
          if (cnt >= minDocs) {
            out = Some(Boilerplate(key, cnt))
            emitted.update(true)
            // threshold reached: drop the doc set — hot lines keep one flag
            docs.clear()
            n.clear()
          } else {
            docs.updateValue(d, true)
            n.update(cnt)
          }
        }
        i += 1
      }
      out.iterator
    }
  }

  /** Append-mode boilerplate feed over a document stream. The session must
    * run the RocksDB state store provider (transformWithState's
    * requirement). Tiling mirrors the batch operator: non-overlapping
    * `lineTokens`-token windows, last tile may be short. */
  def boilerplateLines(docs: Dataset[Doc], lineTokens: Int = 3,
                       minDocs: Int = 3): Dataset[Boilerplate] = {
    require(lineTokens >= 1 && minDocs >= 2, "need lineTokens>=1, minDocs>=2")
    import docs.sparkSession.implicits._
    // split(" ", -1) + null-coalesce mirror the batch operator exactly:
    // Spark SQL's split keeps trailing empty tokens (text "a b " tiles as
    // ["a","b",""]), and NULL text tiles as "" instead of NPE-ing the
    // query — the emitted set must stay equal to the batch drop set
    docs.flatMap { d =>
        Option(d.text).getOrElse("").split(" ", -1).grouped(lineTokens)
          .map(g => LineOcc(g.mkString(" "), d.doc_id)).toSeq
      }
      .groupByKey(_.line)
      .transformWithState(new Processor(minDocs), TimeMode.None(),
        OutputMode.Append())
  }
}
