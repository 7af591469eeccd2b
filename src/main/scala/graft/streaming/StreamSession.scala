package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Timer-driven session summaries on `transformWithState` — the last
  * piece of the arbitrary-state matrix (ValueState: MetricPipeline;
  * MapState: StreamTopK; this: event-time TIMERS). A session's summary
  * must be emitted when the user goes quiet, which no input row can
  * trigger — exactly what state-store timers exist for: each batch the
  * processor extends a per-user timer to lastSeen + gap, and the summary
  * emits from `handleExpiredTimer` when the WATERMARK (not wall clock)
  * passes it, so replays produce identical output.
  *
  * Scale: one ValueState row + one timer per active user, expired state
  * cleared on emission — state is bounded by concurrently-active users,
  * never by history.
  */
object StreamSession {

  final case class UserEvent(user: String, ts: Timestamp, value: Double)
  final case class SessionSummary(
      user: String, n_events: Long, sum_value: Double,
      first_ts: Long, last_ts: Long)

  /** (count, sum, firstMs, lastMs) carried across batches. */
  final case class SessAcc(
      n: Long, sum: Double, firstMs: Long, lastMs: Long)

  final class SessionProcessor(gapMs: Long)
    extends StatefulProcessor[String, UserEvent, SessionSummary] {

    @transient private var acc: ValueState[SessAcc] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      acc = getHandle.getValueState[SessAcc]("sess",
        Encoders.product[SessAcc], TTLConfig.NONE)

    override def handleInputRows(user: String, rows: Iterator[UserEvent],
        timerValues: TimerValues): Iterator[SessionSummary] = {
      val hadSession = acc.exists()
      var cur = if (hadSession) acc.get() else SessAcc(0L, 0.0, Long.MaxValue, 0L)
      // the old deadline exists iff a session was open — keying the guard
      // on the VALUE (> 0) instead would orphan a timer for at/below-epoch
      // event times, and the orphan would later fire against cleared state
      val prevDeadline = if (hadSession) Some(cur.lastMs + gapMs) else None
      // events are folded in TIME order with an explicit gap check: an
      // event more than `gap` past the open session CLOSES it and starts
      // a new one — without this, two bursts landing in one micro-batch
      // merged into a single session while the same bursts split across
      // batches produced two, i.e. output depended on arrival batching
      val out = Seq.newBuilder[SessionSummary]
      rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
        val ms = e.ts.getTime
        if (cur.n > 0 && ms > cur.lastMs + gapMs) {
          out += SessionSummary(user, cur.n, cur.sum, cur.firstMs, cur.lastMs)
          cur = SessAcc(0L, 0.0, Long.MaxValue, 0L)
        }
        cur = SessAcc(cur.n + 1, cur.sum + e.value,
          math.min(cur.firstMs, ms), math.max(cur.lastMs, ms))
      }
      acc.update(cur)
      // slide the session deadline: drop the old timer (timers are keyed
      // by expiry time, not name) and arm one at lastSeen + gap
      prevDeadline.foreach(getHandle.deleteTimer)
      getHandle.registerTimer(cur.lastMs + gapMs)
      out.result().iterator
    }

    override def handleExpiredTimer(user: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionSummary] = {
      val cur = acc.get()
      acc.clear() // session closed: state returns to zero for this user
      Iterator.single(SessionSummary(
        user, cur.n, cur.sum, cur.firstMs, cur.lastMs))
    }
  }

  /** Session summaries with a `gap` quiet period, watermark-driven.
    * `events` must already carry a watermark on `ts`; run with the
    * RocksDB state store ([[MetricPipeline.ensureRocksDbStateStore]]). */
  def sessionSummaries(events: Dataset[UserEvent], gapMs: Long): Dataset[SessionSummary] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user)
      .transformWithState(new SessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
