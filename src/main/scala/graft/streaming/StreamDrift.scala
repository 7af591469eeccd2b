package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** Streaming twin of the batch `profile_drift` query: a continuously
  * maintained event-type distribution, compared against a pinned baseline
  * with the Population Stability Index after every micro-batch.
  *
  * Split of responsibilities, chosen for scale: the KEYED stage (one
  * `ValueState[Long]` per event type — constant state, scales out by key)
  * maintains cumulative counts and emits a changelog row per (type,
  * batch); PSI itself needs every type's count at once, so it is
  * assembled OUTSIDE the keyed stage by [[psi]] over the ≤ #types latest
  * changelog rows — a driver-side fold over a constant-size table, the
  * same audited bound as the IVF centroid collect. Putting PSI inside the
  * processor would force a single global key and funnel the whole stream
  * through one task — the anti-shape this split avoids.
  *
  * The oracle-graded truth for the metric itself is the batch
  * `profile_drift` query (operators/Profiling.scala); this operator is
  * golden-tested on explicit epochs, like the other streaming twins.
  */
object StreamDrift {

  final case class TypedEvent(eventType: String, tsMicros: Long, eventId: Long)
  final case class CountRow(eventType: String, nCum: Long)

  final class CountProcessor
    extends StatefulProcessor[String, TypedEvent, CountRow] {

    @transient private var n: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      n = getHandle.getValueState[Long]("n", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[TypedEvent],
        timerValues: TimerValues): Iterator[CountRow] = {
      val total = (if (n.exists()) n.get() else 0L) + rows.size
      n.update(total)
      Iterator.single(CountRow(key, total))
    }
  }

  /** events → per-type cumulative-count changelog (one row per type per
    * micro-batch that touched it). Caller must run on a RocksDB state
    * store ([[MetricPipeline.ensureRocksDbStateStore]]). */
  def counts(events: Dataset[TypedEvent]): Dataset[CountRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.eventType)
      .transformWithState(new CountProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** PSI of the latest cumulative counts against pinned baseline shares.
    * Observed shares are add-one smoothed over the union of observed and
    * baseline types, so a type absent from either side contributes a
    * large finite term, not ±∞ — the batch query's smoothing rule.
    * Returns (total PSI, per-type terms); |PSI| ≥ 0.2 is the
    * conventional "investigate" threshold. */
  def psi(changelog: Iterable[CountRow],
      baseline: Map[String, Double]): (Double, Map[String, Double]) = {
    require(baseline.nonEmpty && baseline.values.forall(_ > 0.0),
      "baseline shares must be positive")
    val latest = changelog.groupBy(_.eventType)
      .map { case (t, rows) => t -> rows.map(_.nCum).max }
    val types = (latest.keySet ++ baseline.keySet).toSeq.sorted
    val total = latest.values.sum
    val k = types.size.toLong
    // baseline shares renormalized over the union with the same add-one
    // smoothing, so both sides are genuine distributions over `types`
    val baseTotal = baseline.values.sum
    val terms = types.map { t =>
      val pObs = (latest.getOrElse(t, 0L) + 1).toDouble / (total + k)
      val pBase = (baseline.getOrElse(t, 0.0) / baseTotal * total + 1) /
        (total + k)
      t -> ((pObs - pBase) * math.log(pObs / pBase))
    }.toMap
    (terms.values.sum, terms)
  }
}
