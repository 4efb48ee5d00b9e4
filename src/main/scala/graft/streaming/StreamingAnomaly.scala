package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues}
import org.apache.spark.sql.streaming.ValueState

/** STREAMING twin of the q169 trailing-window anomaly detector, as a
  * Spark-4 `transformWithState` processor: per-user state is the ring of
  * the last (up to) 10 cents — a dozen longs in RocksDB per key, the
  * O(window) bound the batch query's `ROWS BETWEEN 10 PRECEDING` frame
  * implies, made explicit. Each event is judged against the ring BEFORE
  * being pushed (the batch frame excludes the current row), with the same
  * integer basis-point contract: dev = |c·n − S|·10⁴ div S, flag at
  * > 20000, warm-up at n ≥ 5.
  *
  * Rows are sorted by (event-time micros, event_id) within each batch's
  * per-key iterator — arrival order is not event order. Across batches the
  * operator assumes time-ordered ingestion (the standard log-stream
  * contract; a backfill replays one AvailableNow batch, where the in-batch
  * sort covers everything), and that is exactly why the drained stream
  * EQUALS the batch query — the q195 oracle is q169's SQL verbatim.
  */
object StreamingAnomaly {

  case class EvC(user_id: Long, ts_us: Long, event_id: Long, c: Long)
  case class Ring(vals: Seq[Long])
  case class Anom(user_id: Long, event_id: Long, c: Long,
                  n_trail: Long, s_trail: Long, dev_bp: Long)

  class AnomalyProcessor extends StatefulProcessor[Long, EvC, Anom] {
    @transient private var state: ValueState[Ring] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Ring]("ring", Encoders.product[Ring],
        TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[EvC],
                                 timers: TimerValues): Iterator[Anom] = {
      var ring =
        if (state.exists()) state.get().vals.toVector else Vector.empty[Long]
      val out = scala.collection.mutable.ListBuffer.empty[Anom]
      // one key's single-batch rows — bounded like TwsSessions (see its note)
      rows.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
        val n = ring.size
        if (n >= 5) {
          val s = ring.sum
          // s == 0 (all-zero trailing cents): the batch twin's SQL DIV
          // yields NULL and the row silently drops out of the `> 20000`
          // filter — skip here too, so drained-stream EQUALS batch holds
          // on that input instead of an ArithmeticException killing the
          // query. (s < 0 cannot occur: c = round(value*100) of a
          // non-negative event value; the guard still covers it.)
          if (s > 0) {
            val dev = math.abs(e.c * n - s) * 10000L / s
            if (dev > 20000L)
              out += Anom(key, e.event_id, e.c, n.toLong, s, dev)
          }
        }
        ring = (ring :+ e.c).takeRight(10)
      }
      state.update(Ring(ring))
      out.iterator
    }
  }

  def detect(events: DataFrame): Dataset[Anom] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), expr("unix_micros(ts)").as("ts_us"),
        col("event_id"), round(col("value") * 100).cast("long").as("c"))
      .as[EvC]
      .groupByKey(_.user_id)
      .transformWithState(new AnomalyProcessor, TimeMode.None(),
        OutputMode.Append())
  }
}
