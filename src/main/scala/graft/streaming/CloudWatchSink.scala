package graft.streaming

import java.util.Locale

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Control-plane-shaped sink adapters: render the pipeline's outputs as
  * the exact payloads the reference's deployment surface emits —
  * `aws cloudwatch put-metric-data` for metric ticks
  * (/root/reference/scripts/custom-metrics.sh:14) and the EMR
  * instance-group resize for scaling actions
  * (/root/reference/config/instance-group-config.json:25-84) — as JSON
  * lines to a pluggable [[CloudWatchSink.Endpoint]]. The sandbox has no
  * AWS egress, so the endpoint abstraction IS the client boundary: a
  * deployment plugs in an SDK/CLI-backed endpoint, tests plug in a
  * collector, and the payload shape is golden-tested field-for-field
  * against the reference's CLI flags either way.
  *
  * Two emission paths:
  *  - [[metricPublisher]]/[[resizePublisher]] (the defaults) emit
  *    PARTITION-PARALLEL: the batch is hashed by clusterId and each
  *    partition renders + emits its own lines in (ts, clusterId) order,
  *    so a 100×-cardinality metric stream never funnels observations
  *    through the driver. Per-series line order (the order a metric
  *    client must preserve) is deterministic; order ACROSS clusters in
  *    different partitions is not, exactly as with N independent
  *    clients.
  *  - [[metricPublisherCollected]]/[[resizePublisherCollected]] collect
  *    to the driver and emit one globally-ordered call — byte-identical
  *    output for the golden tests and fine at the reference's cadence
  *    (one point per cluster per 30 s), but a driver bottleneck as a
  *    general sink; don't default to them.
  */
object CloudWatchSink {

  /** Where rendered JSON lines go — one `emit` per micro-batch
    * (collected path) or per non-empty partition (parallel path). */
  trait Endpoint extends AutoCloseable {
    def emit(lines: Seq[String]): Unit
    override def close(): Unit = {}
  }

  /** Serializable recipe that opens an [[Endpoint]] ON the executor, once
    * per non-empty partition — the boundary that lets the parallel
    * publishers ship work to where the data is. A real deployment opens
    * its SDK/CLI client here; tests use a registry-backed factory. */
  trait EndpointFactory extends Serializable {
    def open(): Endpoint
  }

  /** Default endpoint: the process stdout, like the reference's CLI call
    * under `set -x`. */
  object Stdout extends Endpoint {
    override def emit(lines: Seq[String]): Unit = lines.foreach(println)
  }

  /** Default factory: each partition writes to its executor's stdout. */
  object StdoutFactory extends EndpointFactory {
    override def open(): Endpoint = Stdout
  }

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** One `put-metric-data` call as a JSON line — the CLI flag tuple
    * field-for-field: `--metric-name --namespace --unit --value
    * --dimensions` (custom-metrics.sh:14). The value renders at scale 2
    * (bc's `scale=2` output; the upstream bc_div already truncated). */
  def putMetricDataLine(metricName: String, namespace: String, unit: String,
      value: Double, dimensions: Seq[(String, String)]): String = {
    val dims = dimensions
      .map { case (k, v) => s""""${esc(k)}=${esc(v)}"""" }
      .mkString("[", ",", "]")
    // Locale.ROOT: a comma decimal separator would corrupt the JSON
    val v = String.format(Locale.ROOT, "%.2f", Double.box(value))
    s"""{"action":"put-metric-data","metric-name":"${esc(metricName)}",""" +
      s""""namespace":"${esc(namespace)}","unit":"${esc(unit)}",""" +
      s""""value":$v,"dimensions":$dims}"""
  }

  /** One EMR resize as a JSON line — the ModifyInstanceGroups shape the
    * autoscaling rule drives (instance-group-config.json:30-33: a
    * CHANGE_IN_CAPACITY adjustment lands as a new InstanceCount). */
  def resizeLine(clusterId: String, rule: String, atSec: Long,
      from: Int, to: Int): String =
    s"""{"action":"modify-instance-groups","cluster-id":"${esc(clusterId)}",""" +
      s""""rule":"${esc(rule)}","at-epoch-sec":$atSec,""" +
      s""""from-capacity":$from,"instance-count":$to}"""

  /** Partition-parallel emit core: hash the batch by clusterId so one
    * series never splits across endpoints, order each partition by
    * `orderCols`, render with `line`, and emit once per non-empty
    * partition through a fresh endpoint from `factory`. The closure
    * ships only the serializable factory and render function — no
    * driver-side state. */
  private def emitPartitioned(batch: DataFrame, orderCols: Seq[String],
      factory: EndpointFactory, line: Row => String): Unit =
    batch
      .repartition(col("clusterId"))
      .sortWithinPartitions(orderCols.map(col): _*)
      .foreachPartition { (it: Iterator[Row]) =>
        val lines = it.map(line).toSeq
        if (lines.nonEmpty) {
          val ep = factory.open()
          try ep.emit(lines) finally ep.close()
        }
      }

  /** foreachBatch sink for [[MetricPipeline.MetricPoint]] batches: each
    * observation becomes one put-metric-data line, emitted
    * partition-parallel (per-cluster (ts) order; see the object doc). */
  def metricPublisher(namespace: String = "AWS/ElasticMapReduce",
      unit: String = "Percent",
      factory: EndpointFactory = StdoutFactory): (DataFrame, Long) => Unit =
    (batch, _) => emitPartitioned(
      batch.select(col("ts"), col("clusterId"), col("metric"), col("value")),
      Seq("ts", "clusterId"), factory,
      r => putMetricDataLine(r.getString(2), namespace, unit, r.getDouble(3),
        Seq("JobFlowId" -> r.getString(1))))

  /** foreachBatch sink for [[graft.state.Scaling.Action]] batches: each
    * scaling action becomes one resize line, emitted partition-parallel —
    * the default sink of [[MetricPipeline.start]]. */
  def resizePublisher(
      factory: EndpointFactory = StdoutFactory): (DataFrame, Long) => Unit =
    (batch, _) => emitPartitioned(
      batch.select(col("clusterId"), col("rule"), col("atSec"),
        col("from"), col("to")),
      Seq("atSec", "clusterId"), factory,
      r => resizeLine(r.getString(0), r.getString(1), r.getLong(2),
        r.getInt(3), r.getInt(4)))

  /** Driver-collected form of [[metricPublisher]]: one globally-ordered
    * emit per batch. Byte-identical goldens only — as a general sink it
    * funnels every observation through the driver. */
  def metricPublisherCollected(namespace: String = "AWS/ElasticMapReduce",
      unit: String = "Percent",
      endpoint: Endpoint = Stdout): (DataFrame, Long) => Unit =
    (batch, _) => {
      val lines = batch
        .select(col("ts"), col("clusterId"), col("metric"), col("value"))
        .orderBy(col("ts"), col("clusterId"))
        .collect()
        .map { r =>
          putMetricDataLine(r.getString(2), namespace, unit, r.getDouble(3),
            Seq("JobFlowId" -> r.getString(1)))
        }
      if (lines.nonEmpty) endpoint.emit(lines.toSeq)
    }

  /** Driver-collected form of [[resizePublisher]] — goldens only. */
  def resizePublisherCollected(
      endpoint: Endpoint = Stdout): (DataFrame, Long) => Unit =
    (batch, _) => {
      val lines = batch
        .select(col("clusterId"), col("rule"), col("atSec"),
          col("from"), col("to"))
        .orderBy(col("atSec"), col("clusterId"))
        .collect()
        .map(r => resizeLine(r.getString(0), r.getString(1), r.getLong(2),
          r.getInt(3), r.getInt(4)))
      if (lines.nonEmpty) endpoint.emit(lines.toSeq)
    }
}
