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
  * the stream's key hash — no global structure anywhere. */
object StatefulFirstSeen {

  final case class FirstSeen(user_id: Long, event_type: String)

  class Processor(maxTypes: Int)
      extends StatefulProcessor[Long, Event, FirstSeen] {
    @transient private var seen: MapState[String, Boolean] = _
    @transient private var nSeen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      seen = getHandle.getMapState("seen",
        Encoders.STRING, Encoders.scalaBoolean, TTLConfig.NONE)
      nSeen = getHandle.getValueState("n", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 timers: TimerValues): Iterator[FirstSeen] =
      rows.flatMap { e =>
        val n = if (nSeen.exists()) nSeen.get() else 0L
        if (n < maxTypes && !seen.containsKey(e.event_type)) {
          seen.updateValue(e.event_type, true)
          nSeen.update(n + 1)
          Iterator.single(FirstSeen(key, e.event_type))
        } else Iterator.empty
      }
  }

  /** Append-mode first-seen stream, keyed by user. The session must run the
    * RocksDB state store provider (transformWithState's requirement). */
  def firstSeenTypes(events: Dataset[Event], maxTypes: Int): Dataset[FirstSeen] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new Processor(maxTypes), TimeMode.None(), OutputMode.Append())
  }
}
