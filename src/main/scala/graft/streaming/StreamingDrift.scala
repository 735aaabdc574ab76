package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import graft.streaming.StreamingAgg.Event

/** Streaming ingest-drift monitor — the stream twin of the batch q154
  * drift query: per event TYPE, per finalized event-time window, the
  * event count next to the PREVIOUS window's count and their smoothed
  * log-ratio. A sudden swing says one stream of the intake changed rate
  * (a source died, a crawler went rogue) while the job is still running —
  * the alarm q154 raises only at the next batch roll-up.
  *
  * Built on Spark 4's `transformWithState` with EVENT-TIME TIMERS — the
  * API surface the windowed-aggregation operators can't reach: the
  * operator needs cross-window memory (this window's count AND the
  * previous window's) keyed per category, which a tumbling-window
  * aggregate forgets the moment the window closes. One stateful operator,
  * no stream-stream self-join (joins between streaming aggregations are
  * unsupported, and the join would double state anyway).
  *
  * Mechanics per key (= event type): a MapState holds open-window counts
  * (window start → n); the first event of a window registers an event-time
  * timer at the window END, so the window finalizes exactly when the
  * watermark passes it — the same lifecycle a built-in windowed aggregate
  * gives its windows. The expired-timer callback emits the drift row,
  * promotes the window into the one-entry `prev` ValueState, and deletes
  * the map entry. Gap semantics: if the previous calendar window saw no
  * events (no timer ever fired for it), the emitted n_prev is 0 — a silent
  * source reads as a drop to zero, not as "no news".
  *
  * Scale: state per key is the open windows inside the watermark horizon
  * plus one previous-window entry — bounded by lateness, not by history;
  * keys partition by hash across the cluster; rows later than the
  * watermark are dropped at the handler (the same contract the built-in
  * window aggregate applies). RocksDB state store required, as for all
  * transformWithState operators. */
object StreamingDrift {

  final case class WinCount(start: Long, n: Long)
  final case class RateDrift(event_type: String,
                             window_start: java.sql.Timestamp,
                             n_cur: Long, n_prev: Long, log_ratio: Double)

  class Processor(windowMs: Long)
      extends StatefulProcessor[String, Event, RateDrift] {
    @transient private var open: MapState[Long, Long] = _
    @transient private var prev: ValueState[WinCount] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      open = getHandle.getMapState("open",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
      prev = getHandle.getValueState("prev",
        Encoders.product[WinCount], TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[Event],
                                 timers: TimerValues): Iterator[RateDrift] = {
      val wm = timers.getCurrentWatermarkInMs
      rows.foreach { e =>
        val ws = Math.floorDiv(e.ts.getTime, windowMs) * windowMs
        // late rows (window already finalized by the watermark) drop —
        // the built-in window aggregate's contract
        if (ws + windowMs > wm) {
          val cur = if (open.containsKey(ws)) open.getValue(ws) else 0L
          if (cur == 0L) getHandle.registerTimer(ws + windowMs)
          open.updateValue(ws, cur + 1L)
        }
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, timers: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[RateDrift] = {
      val ws = info.getExpiryTimeInMs - windowMs
      if (!open.containsKey(ws)) Iterator.empty
      else {
        val n = open.getValue(ws)
        open.removeKey(ws)
        val p = Option(prev.get())
        // a calendar gap (or an older stale prev) means the previous
        // window was empty: drift against 0, not against stale history
        val nPrev = p match {
          case Some(WinCount(s, pn)) if s == ws - windowMs => pn
          case _ => 0L
        }
        prev.update(WinCount(ws, n))
        val ratio = BigDecimal(math.log((n + 1).toDouble / (nPrev + 1).toDouble))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        Iterator.single(
          RateDrift(key, new java.sql.Timestamp(ws), n, nPrev, ratio))
      }
    }
  }

  /** Append-mode per-type rate-drift stream. `events` must carry a
    * watermark on `ts` (the caller picks the lateness budget); windows
    * tumble every `window`. Requires the RocksDB state store provider. */
  def rateDrift(events: Dataset[Event],
                window: java.time.Duration): Dataset[RateDrift] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .transformWithState(new Processor(window.toMillis),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
