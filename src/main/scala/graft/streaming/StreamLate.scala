package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** Streaming twin of the batch `events_late_report` query
  * (operators/EventAnalytics.scala): out-of-order arrival measurement,
  * emitted continuously as a per-type, per-micro-batch summary row.
  *
  * The batch query blocks arrivals into fixed 100-event groups and
  * compares each event against the running max event-time of PRIOR
  * blocks. Here the micro-batch IS the block: the keyed stage holds one
  * `ValueState[Long]` per event type — the max event-time over all PRIOR
  * batches — so an event is late exactly when its ts precedes that
  * watermark-in-waiting, and within-batch disorder is invisible, the
  * same deliberate fidelity knob as the batch query's block span (the
  * micro-batch trigger interval plays the role of the block size).
  * State is O(#types) — one long each — regardless of stream length.
  *
  * Keying contract, deliberate: the running max is PER TYPE, the
  * partition-per-source deployment shape (each type = one ordered-ish
  * source partition), where the batch report measures disorder against
  * the GLOBAL arrival sequence. `StreamLateSpec` golden-tests this
  * operator against an explicit per-type replay of the same rule, not
  * against the registry query's global formulation.
  */
object StreamLate {

  final case class TypedEvent(eventType: String, tsMicros: Long, eventId: Long)
  final case class LateSummary(eventType: String, n: Long, nLate: Long,
      maxLateUs: Long)

  final class LateProcessor
    extends StatefulProcessor[String, TypedEvent, LateSummary] {

    @transient private var priorMax: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      priorMax = getHandle.getValueState[Long]("priorMax",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[TypedEvent],
        timerValues: TimerValues): Iterator[LateSummary] = {
      val prior = if (priorMax.exists()) Some(priorMax.get()) else None
      var n = 0L; var nLate = 0L; var maxLate = 0L
      var batchMax = prior.getOrElse(Long.MinValue)
      rows.foreach { e =>
        n += 1
        prior.foreach { p =>
          if (e.tsMicros < p) {
            nLate += 1
            if (p - e.tsMicros > maxLate) maxLate = p - e.tsMicros
          }
        }
        if (e.tsMicros > batchMax) batchMax = e.tsMicros
      }
      priorMax.update(batchMax)
      if (n == 0) Iterator.empty
      else Iterator.single(LateSummary(key, n, nLate, maxLate))
    }
  }

  /** events → per-(type, micro-batch) lateness summary changelog. Caller
    * must run on a RocksDB state store
    * ([[MetricPipeline.ensureRocksDbStateStore]]). */
  def lateness(events: Dataset[TypedEvent]): Dataset[LateSummary] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.eventType)
      .transformWithState(new LateProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
