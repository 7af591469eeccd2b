package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, ValueState}

/** Streaming twin of the batch `metric_cusum` query: per-series one-sided
  * CUSUM drift detection on Spark 4's `transformWithState`. Where the
  * batch form derives the target from the series' own mean (a two-pass
  * global), a stream cannot see its future — the standard streaming CUSUM
  * runs against a CONFIGURED target and slack (the SPC chart's reference
  * values), keeping state O(1) per series: just the running statistic.
  *
  * Semantics: S ← max(0, S + (v − target − slack)) per observation in
  * (ts, eventId) order within a batch; S > h emits an alarm and, with
  * `resetOnAlarm` (the standard chart behavior), restarts the
  * accumulation so a persistent shift re-alarms every h worth of excess
  * rather than once ever. As with StreamAnomaly, the oracle-graded truth
  * is the batch query; this operator is golden-tested on explicit epochs
  * (including the cross-epoch accumulation the state store must carry).
  */
object StreamCusum {

  import StreamAnomaly.MetricEvent

  final case class CusumAlarm(series: String, tsMicros: Long, eventId: Long,
      value: Double, s: Double)

  final case class Acc(s: Double)

  final class CusumProcessor(target: Double, slack: Double, h: Double,
      resetOnAlarm: Boolean)
    extends StatefulProcessor[String, MetricEvent, CusumAlarm] {

    @transient private var acc: ValueState[Acc] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      acc = getHandle.getValueState[Acc]("acc",
        Encoders.product[Acc], org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(series: String, rows: Iterator[MetricEvent],
        timerValues: TimerValues): Iterator[CusumAlarm] = {
      var s = if (acc.exists()) acc.get().s else 0.0
      val out = Seq.newBuilder[CusumAlarm]
      rows.toSeq.sortBy(e => (e.tsMicros, e.eventId)).foreach { e =>
        s = math.max(0.0, s + (e.value - target - slack))
        if (s > h) {
          out += CusumAlarm(series, e.tsMicros, e.eventId, e.value, s)
          if (resetOnAlarm) s = 0.0
        }
      }
      acc.update(Acc(s))
      out.result().iterator
    }
  }

  /** The streaming query fragment: metric events → drift-alarm changelog.
    * Caller must run on a RocksDB-backed state store
    * ([[MetricPipeline.ensureRocksDbStateStore]]). */
  def alarms(events: Dataset[MetricEvent], target: Double, slack: Double,
      h: Double, resetOnAlarm: Boolean = true): Dataset[CusumAlarm] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.series)
      .transformWithState(new CusumProcessor(target, slack, h, resetOnAlarm),
        TimeMode.None(), OutputMode.Append())
  }
}
