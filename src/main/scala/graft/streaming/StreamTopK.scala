package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues}

/** Streaming heavy-hitters per group on Spark 4's `transformWithState`
  * MapState: running exact counts keyed by (group, item) in the state
  * store, the current top-k re-emitted after every micro-batch that
  * touches the group — a changelog the sink can upsert.
  *
  * This is the streaming twin of the batch `sketch_topk` space-saving
  * aggregate: exact counts here because MapState scales out by GROUP (each
  * group's item map lives in one state-store partition, far from driver
  * memory), while the batch sketch bounds memory per AGGREGATION BUFFER.
  * Bounding per-group item cardinality at 100 TB is the item-domain's
  * job (pre-hash / pre-filter), mirrored by the `maxItems` guard here:
  * past it, the operator fails loudly rather than silently growing state.
  */
object StreamTopK {

  final case class ItemEvent(group: String, item: String)
  final case class TopKRow(group: String, item: String, cnt: Long, rank: Long)

  final class TopKProcessor(k: Int, maxItems: Int)
    extends StatefulProcessor[String, ItemEvent, TopKRow] {

    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("counts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(group: String, rows: Iterator[ItemEvent],
        timerValues: TimerValues): Iterator[TopKRow] = {
      rows.foreach { e =>
        val cur = if (counts.containsKey(e.item)) counts.getValue(e.item) else 0L
        counts.updateValue(e.item, cur + 1L)
      }
      val all = counts.iterator().toSeq
      if (all.size > maxItems) throw new IllegalStateException(
        s"stream_topk: group '$group' holds ${all.size} distinct items " +
          s"(cap $maxItems) — bound the item domain upstream")
      all.sortBy { case (item, cnt) => (-cnt, item) }
        .take(k).zipWithIndex
        .map { case ((item, cnt), i) => TopKRow(group, item, cnt, i + 1L) }
        .iterator
    }
  }

  /** The streaming query fragment: group+item events → per-batch top-k
    * changelog. Caller must run on a RocksDB-backed state store
    * ([[MetricPipeline.ensureRocksDbStateStore]]). */
  def topK(events: Dataset[ItemEvent], k: Int,
      maxItems: Int = 100000): Dataset[TopKRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.group)
      .transformWithState(new TopKProcessor(k, maxItems),
        TimeMode.None(), OutputMode.Append())
  }
}
