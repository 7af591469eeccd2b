package graft.streaming

import java.util.Locale

import org.apache.spark.sql.DataFrame
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
  * Batches are collected on the driver by design: these are control-plane
  * API calls (one per 30 s tick / scaling action), constant-size by the
  * pipeline's construction, never data-plane volumes.
  */
object CloudWatchSink {

  /** Where rendered JSON lines go. Driver-side, one call per micro-batch. */
  trait Endpoint extends AutoCloseable {
    def emit(lines: Seq[String]): Unit
    override def close(): Unit = {}
  }

  /** Default endpoint: the process stdout, like the reference's CLI call
    * under `set -x`. */
  object Stdout extends Endpoint {
    override def emit(lines: Seq[String]): Unit = lines.foreach(println)
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

  /** foreachBatch sink for [[MetricPipeline.MetricPoint]] batches: each
    * observation becomes one put-metric-data line, in (ts, clusterId)
    * order so replayed batches render byte-identically. */
  def metricPublisher(namespace: String = "AWS/ElasticMapReduce",
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

  /** foreachBatch sink for [[graft.state.Scaling.Action]] batches: each
    * scaling action becomes one resize line — the default sink of
    * [[MetricPipeline.start]]. */
  def resizePublisher(endpoint: Endpoint = Stdout): (DataFrame, Long) => Unit =
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
