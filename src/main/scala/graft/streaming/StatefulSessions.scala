package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful sessionization via flatMapGroupsWithState (§2.12 north
  * star: "custom state via flatMapGroupsWithState").
  *
  * State per user = the open session (start, last-seen, count). An event
  * that arrives more than `gapMinutes` after last-seen closes the session
  * (emits it) and opens a new one. In streaming mode the input MUST carry a
  * watermark on `ts`; an event-time timeout at last-seen + gap then flushes
  * idle sessions and removes their state once the watermark passes. In batch
  * mode (used by the equivalence test and the Trigger.AvailableNow
  * equivalence argument) each group's full history arrives at once and every
  * closed session is emitted plus the final open one.
  *
  * Scale: state is O(users), one small struct each, and the timeout removal
  * keeps it bounded by active users within the watermark horizon; the
  * shuffle is the same single user_id exchange as the batch gaps-and-islands
  * formulation.
  */
object StatefulSessions {

  case class Ev(user_id: Long, ts: Timestamp, event_id: Long)
  case class SessionState(start: Long, last: Long, n: Long, firstEv: Long, lastEv: Long)
  case class Session(user_id: Long, sess: Long, n: Long, first_ev: Long, last_ev: Long)

  def sessionize(events: DataFrame, gapMinutes: Int): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val isBatch = !events.isStreaming // capture primitively: DataFrames must not enter the closure

    def flush(userId: Long, evs: Iterator[Ev], state: GroupState[SessionState]): Iterator[Session] = {
      var out = List.empty[SessionState]
      var cur = state.getOption.orNull
      // Bound: materializes ONE key's rows from ONE (micro)batch for the
      // semantically-required event-time sort — task memory ∝ the hottest
      // key's per-batch row count, not its full history (see the identical
      // note in TwsSessions; hot-key behavior pinned in StreamingSpec).
      evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        val tUs = e.ts.getTime * 1000L
        if (cur == null) {
          cur = SessionState(tUs, tUs, 1, e.event_id, e.event_id)
        } else if (tUs - cur.last > gapUs) {
          out = cur :: out
          cur = SessionState(tUs, tUs, 1, e.event_id, e.event_id)
        } else {
          cur = cur.copy(last = tUs, n = cur.n + 1,
            firstEv = math.min(cur.firstEv, e.event_id),
            lastEv = math.max(cur.lastEv, e.event_id))
        }
      }
      if (state.hasTimedOut) {
        // watermark passed last-seen + gap: the open session is closed by
        // definition — emit it and drop the per-user state
        val res = state.getOption.toList
        state.remove()
        res.map(s => Session(userId, s.start, s.n, s.firstEv, s.lastEv)).iterator
      } else {
        if (cur != null) {
          state.update(cur)
          // arm the event-time timeout so an idle session is flushed once
          // the watermark reaches its close time (millis, like GroupState).
          // An out-of-order event within the watermark allowance can put
          // last+gap BEHIND the current watermark — Spark rejects such a
          // timestamp, so clamp to just past the watermark (the session is
          // already closed by definition; it flushes on the next batch).
          if (!isBatch) {
            val close = cur.last / 1000L + gapMinutes.toLong * 60000L
            state.setTimeoutTimestamp(math.max(close, state.getCurrentWatermarkMs() + 1))
          }
        }
        // batch mode: everything arrived; emit closed sessions AND the open one
        val all = if (isBatch && cur != null) (cur :: out).reverse else out.reverse
        all.map(s => Session(userId, s.start, s.n, s.firstEv, s.lastEv)).iterator
      }
    }

    val timeout =
      if (isBatch) GroupStateTimeout.NoTimeout()
      else GroupStateTimeout.EventTimeTimeout()
    events.select(col("user_id"), col("ts"), col("event_id")).as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(flush)
  }
}
