package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}
import graft.streaming.StreamingAgg.Event

/** First-occurrence detection per key on Spark 4's `transformWithState` —
  * the arbitrary-state API that succeeds `mapGroupsWithState` (typed state
  * VARIABLES instead of one state object: here a MapState registry plus a
  * ValueState counter, each independently evolvable and TTL-able).
  *
  * The operator emits (user, event_type) the FIRST time a user produces
  * each event type, capped at `maxTypes` registered types per user — the
  * streaming form of a "new behavior" trigger (first purchase, first use
  * of a feature), with the cap bounding per-key state exactly like the
  * batch capPerKey bounds per-key output.
  *
  * Scale: state lives in the RocksDB state store (the provider
  * `transformWithState` requires — set
  * `spark.sql.streaming.stateStore.providerClass` to
  * `...state.RocksDBStateStoreProvider` on the session), keyed by user:
  * per-key state is ≤ maxTypes map entries + one counter, partitioned by
  * the stream's key hash — no global structure anywhere. State hygiene for
  * a long-running stream comes from the optional `ttl`: both state
  * variables carry the same processing-time TTL, so a user idle past the
  * TTL is silently evicted from RocksDB and re-emits as newly-seen on
  * return — the "first seen in the last N days" semantics a trigger
  * pipeline actually wants, and the bound that keeps total state
  * proportional to ACTIVE keys instead of all keys ever seen. */
object StatefulFirstSeen {

  final case class FirstSeen(user_id: Long, event_type: String)

  class Processor(maxTypes: Int, ttl: TTLConfig)
      extends StatefulProcessor[Long, Event, FirstSeen] {
    @transient private var seen: MapState[String, Boolean] = _
    @transient private var nSeen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      seen = getHandle.getMapState("seen",
        Encoders.STRING, Encoders.scalaBoolean, ttl)
      nSeen = getHandle.getValueState("n", Encoders.scalaLong, ttl)
    }

    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 timers: TimerValues): Iterator[FirstSeen] = {
      // Spark does NOT order a key's rows by event time within a batch, so
      // an as-delivered fold would let shuffle arrival order decide WHICH
      // types claim the cap slots. Buffer + sort pins "first seen" to
      // event-time order (ties: type, then id) — deterministic under
      // replays and repartitions. The buffer is one key's slice of one
      // micro-batch, the same bound every sort-based streaming agg carries.
      val ordered = rows.toArray
        .sortBy(e => (e.ts.getTime, e.event_type, e.event_id))
      ordered.iterator.flatMap { e =>
        val n = if (nSeen.exists()) nSeen.get() else 0L
        if (n < maxTypes && !seen.containsKey(e.event_type)) {
          seen.updateValue(e.event_type, true)
          nSeen.update(n + 1)
          Iterator.single(FirstSeen(key, e.event_type))
        } else Iterator.empty
      }
    }
  }

  /** Append-mode first-seen stream, keyed by user. The session must run the
    * RocksDB state store provider (transformWithState's requirement).
    * `ttl` (processing-time) expires an idle user's registry so it re-emits
    * on return; TTL requires TimeMode.ProcessingTime, which the method
    * selects automatically. */
  def firstSeenTypes(events: Dataset[Event], maxTypes: Int,
                     ttl: Option[java.time.Duration] = None): Dataset[FirstSeen] = {
    import events.sparkSession.implicits._
    val (cfg, mode) = ttl match {
      case Some(d) => (TTLConfig(d), TimeMode.ProcessingTime())
      case None    => (TTLConfig.NONE, TimeMode.None())
    }
    events.groupByKey(_.user_id)
      .transformWithState(new Processor(maxTypes, cfg), mode, OutputMode.Append())
  }
}
