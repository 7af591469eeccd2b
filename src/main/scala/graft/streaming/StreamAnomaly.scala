package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, ValueState}

/** Streaming twin of the batch `metric_anomaly` query: per-series
  * trailing-window z-score on Spark 4's `transformWithState`, a ValueState
  * ring of the last `window` observations per series (constant state per
  * key — the streaming analogue of the batch ROWS frame).
  *
  * Semantics: each observation is scored against the values that PRECEDE
  * it (the batch query's `-20, -1` frame), then pushed into the ring.
  * Rows within a micro-batch are processed in (ts, eventId) order; across
  * batches the order is arrival order — the watermarking/ordering contract
  * is the source's, which is why the oracle-graded truth is the batch
  * query and this operator is golden-tested on explicit epochs instead.
  * Scale: state scales out by series key and is O(window) doubles per
  * series; an unbounded-cardinality series domain is the upstream's job to
  * bound, same contract as StreamTopK.
  */
object StreamAnomaly {

  final case class MetricEvent(series: String, tsMicros: Long, eventId: Long,
      value: Double)
  final case class AnomalyRow(series: String, tsMicros: Long, eventId: Long,
      value: Double, n: Long, mean: Double, z: Double)

  final case class Ring(vals: List[Double])

  final class AnomalyProcessor(window: Int, minObs: Int, threshold: Double)
    extends StatefulProcessor[String, MetricEvent, AnomalyRow] {

    @transient private var ring: ValueState[Ring] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      ring = getHandle.getValueState[Ring]("ring",
        Encoders.product[Ring], org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(series: String, rows: Iterator[MetricEvent],
        timerValues: TimerValues): Iterator[AnomalyRow] = {
      var vals = if (ring.exists()) ring.get().vals else Nil
      val out = Seq.newBuilder[AnomalyRow]
      // in-batch determinism: score in event order, not shuffle order
      rows.toSeq.sortBy(e => (e.tsMicros, e.eventId)).foreach { e =>
        val n = vals.length
        if (n >= minObs) {
          val mean = vals.sum / n
          // two-pass (shifted) variance, NOT E[x²]−mean²: the ring is in
          // memory, and the textbook form catastrophically cancels for
          // high-baseline series (|v|~1e12, stddev~1e3 → E[x²] ulp swamps
          // the variance and every spike goes unflagged, silently)
          val variance = vals.map { v =>
            val dv = v - mean; dv * dv
          }.sum / n
          if (variance > 0) {
            val z = (e.value - mean) / math.sqrt(variance)
            if (math.abs(z) > threshold)
              out += AnomalyRow(series, e.tsMicros, e.eventId, e.value, n, mean, z)
          }
        }
        vals = (vals :+ e.value).takeRight(window)
      }
      ring.update(Ring(vals))
      out.result().iterator
    }
  }

  /** The streaming query fragment: metric events → anomaly changelog.
    * Caller must run on a RocksDB-backed state store
    * ([[MetricPipeline.ensureRocksDbStateStore]]). */
  def anomalies(events: Dataset[MetricEvent], window: Int = 20,
      minObs: Int = 10, threshold: Double = 2.5): Dataset[AnomalyRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.series)
      .transformWithState(new AnomalyProcessor(window, minObs, threshold),
        TimeMode.None(), OutputMode.Append())
  }
}
