package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

import StatefulSessions.{Ev, Session, SessionState}

/** Sessionization on Spark 4's `transformWithState` — the successor to
  * flatMapGroupsWithState (SPARK-46815): explicit named state registered in
  * `init`, first-class event-time TIMERS instead of a single timeout slot,
  * and the RocksDB state-store provider requirement that gives changelog
  * checkpointing at scale. Session semantics are IDENTICAL to
  * `StatefulSessions.sessionize` (same `Ev`/`Session` shapes, same gap
  * rule) — the spec asserts both implementations agree batch-for-batch.
  *
  * Scale: state is one small struct per active user in RocksDB (off-heap,
  * spillable — the 100 TB-friendly store); one timer per user flushes the
  * open session once the watermark passes last-seen + gap and removes the
  * state, so the store is bounded by users active inside the watermark
  * horizon.
  */
object TwsSessions {

  class SessionProcessor(gapMinutes: Int)
      extends StatefulProcessor[Long, Ev, Session] {

    @transient private var state: ValueState[SessionState] = _
    private val gapMs = gapMinutes.toLong * 60000L

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessionState](
        "session", Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
                                 timers: TimerValues): Iterator[Session] = {
      var out = List.empty[SessionState]
      var cur = if (state.exists()) state.get() else null
      // Bound: this materializes ONE key's rows from ONE microbatch — the
      // sort is semantically required (arrival order within a batch is not
      // event-time order). Task memory is ∝ the hottest key's PER-BATCH row
      // count, never its full history: with watermarked ingestion a batch
      // spans one trigger interval, and a backfill (AvailableNow over deep
      // history) should bound batch size at the source (maxFilesPerTrigger/
      // maxBytesPerTrigger). Persistent state stays one small struct per
      // key. Hot-key behavior is pinned in StreamingSpec.
      rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        val tUs = e.ts.getTime * 1000L
        if (cur == null) {
          cur = SessionState(tUs, tUs, 1, e.event_id, e.event_id)
        } else if (tUs - cur.last > gapMs * 1000L) {
          out = cur :: out
          cur = SessionState(tUs, tUs, 1, e.event_id, e.event_id)
        } else {
          cur = cur.copy(last = math.max(cur.last, tUs), n = cur.n + 1,
            firstEv = math.min(cur.firstEv, e.event_id),
            lastEv = math.max(cur.lastEv, e.event_id))
        }
      }
      if (cur != null) {
        state.update(cur)
        // single live timer per key: re-arm at the open session's deadline
        getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
        getHandle.registerTimer(cur.last / 1000L + gapMs)
      }
      out.reverse.map(s => Session(key, s.start, s.n, s.firstEv, s.lastEv)).iterator
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[Session] =
      if (state.exists()) {
        val s = state.get()
        // a stale timer (re-armed later by new events) must not flush early
        if (info.getExpiryTimeInMs >= s.last / 1000L + gapMs) {
          state.clear()
          Iterator.single(Session(key, s.start, s.n, s.firstEv, s.lastEv))
        } else Iterator.empty
      } else Iterator.empty
  }

  /** Streaming sessionize; input must carry a watermark on `ts`. */
  def sessionize(events: DataFrame, gapMinutes: Int): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("ts"), col("event_id")).as[Ev]
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMinutes),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
