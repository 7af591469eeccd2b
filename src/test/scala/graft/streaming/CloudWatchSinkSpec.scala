package graft.streaming

import java.nio.file.Files

import scala.collection.mutable.ArrayBuffer

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Golden tests for the control-plane payloads: the rendered JSON must
  * carry the reference CLI's field tuple exactly —
  * `aws cloudwatch put-metric-data --metric-name YARNCoreAvailablePercentage
  *  --namespace AWS/ElasticMapReduce --unit Percent --value <bc scale=2>
  *  --dimensions JobFlowId=<id>` (custom-metrics.sh:14). */
class CloudWatchSinkSpec extends SparkSuite {

  private final class Collecting extends CloudWatchSink.Endpoint {
    val lines: ArrayBuffer[String] = ArrayBuffer.empty
    override def emit(ls: Seq[String]): Unit = synchronized { lines ++= ls }
  }

  test("put-metric-data line matches the CLI flag tuple field-for-field") {
    // 2 of 16 cores: bc `scale=2; 2*100/16` = 12.50
    val line = CloudWatchSink.putMetricDataLine(
      "YARNCoreAvailablePercentage", "AWS/ElasticMapReduce", "Percent",
      12.50, Seq("JobFlowId" -> "j-GOLD"))
    assert(line ==
      """{"action":"put-metric-data","metric-name":"YARNCoreAvailablePercentage","namespace":"AWS/ElasticMapReduce","unit":"Percent","value":12.50,"dimensions":["JobFlowId=j-GOLD"]}""")
  }

  test("value renders at bc scale=2 (truncated upstream, two decimals out)") {
    // bc `scale=2; 1*100/3` = 33.33 — bc_div already truncated; the
    // renderer must not re-round
    val line = CloudWatchSink.putMetricDataLine(
      "YARNCoreAvailablePercentage", "AWS/ElasticMapReduce", "Percent",
      33.33, Seq("JobFlowId" -> "j-GOLD"))
    assert(line.contains(""""value":33.33,"""))
  }

  test("resize line carries the ModifyInstanceGroups shape") {
    val line = CloudWatchSink.resizeLine("j-GOLD", "scale-out", 1700000300L, 1, 6)
    assert(line ==
      """{"action":"modify-instance-groups","cluster-id":"j-GOLD","rule":"scale-out","at-epoch-sec":1700000300,"from-capacity":1,"instance-count":6}""")
  }

  test("startPublish renders every tick as a put-metric-data line, in order") {
    val f = Files.createTempFile("graft_cw_trace", ".jsonl")
    val lines = (0 until 4).map { i =>
      s"""{"ts": ${1700000000L + i * 30}, "payload": "{\\"clusterMetrics\\": {\\"availableVirtualCores\\": ${i + 1}, \\"totalVirtualCores\\": 16}}"}"""
    }
    Files.writeString(f, lines.mkString("\n"))
    val payloads = spark.readStream.format("graft.sources.ReplaySource")
      .option("path", f.toString).option("maxRowsPerBatch", "2").load()
    TestEndpoints.clear("cw_publish")
    val ckpt = Files.createTempDirectory("graft_cw_ckpt").toString
    val q = MetricPipeline.startPublish(payloads, "j-CW", ckpt,
      TestEndpoints.Factory("cw_publish"), Trigger.AvailableNow())
    q.awaitTermination(60000)
    // bc scale=2: 1*100/16=6.25, 2*100/16=12.50, 3*100/16=18.75, 4*100/16=25.00
    // one cluster → one non-empty partition per batch, so the
    // partition-parallel path still yields a single deterministic order
    val expected = Seq("6.25", "12.50", "18.75", "25.00").map { v =>
      s"""{"action":"put-metric-data","metric-name":"YARNCoreAvailablePercentage","namespace":"AWS/ElasticMapReduce","unit":"Percent","value":$v,"dimensions":["JobFlowId=j-CW"]}"""
    }
    assert(TestEndpoints.lines("cw_publish") == expected,
      TestEndpoints.lines("cw_publish").mkString("\n"))
  }

  test("resizePublisher renders action batches as resize lines") {
    import spark.implicits._
    val actions = Seq(
      ("j-CW", "scale-out", 1700000300L, 1, 6),
      ("j-CW", "scale-in", 1700000900L, 6, 4))
      .toDF("clusterId", "rule", "atSec", "from", "to")
    val expected = Seq(
      """{"action":"modify-instance-groups","cluster-id":"j-CW","rule":"scale-out","at-epoch-sec":1700000300,"from-capacity":1,"instance-count":6}""",
      """{"action":"modify-instance-groups","cluster-id":"j-CW","rule":"scale-in","at-epoch-sec":1700000900,"from-capacity":6,"instance-count":4}""")
    val ep = new Collecting
    CloudWatchSink.resizePublisherCollected(ep)(actions, 0L)
    assert(ep.lines.toSeq == expected)
    TestEndpoints.clear("cw_resize")
    CloudWatchSink.resizePublisher(TestEndpoints.Factory("cw_resize"))(actions, 0L)
    assert(TestEndpoints.lines("cw_resize") == expected)
  }

  test("partition-parallel publisher emits the collected form's lines exactly, per-series order preserved") {
    import spark.implicits._
    // 3 clusters × 4 ticks, deliberately interleaved and unsorted
    val rows = for {
      i <- 3 to 0 by -1
      c <- Seq("j-B", "j-A", "j-C")
    } yield (new java.sql.Timestamp(1700000000000L + i * 30000L),
      c, "YARNCoreAvailablePercentage", (i + 1) * 6.25)
    val batch = rows.toDF("ts", "clusterId", "metric", "value")
    val ep = new Collecting
    CloudWatchSink.metricPublisherCollected(endpoint = ep)(batch, 0L)
    TestEndpoints.clear("cw_par")
    CloudWatchSink.metricPublisher(
      factory = TestEndpoints.Factory("cw_par"))(batch, 1L)
    val par = TestEndpoints.lines("cw_par")
    // same lines (nothing lost or duplicated by the partition fan-out)...
    assert(par.sorted == ep.lines.toSeq.sorted)
    // ...and within every cluster the (ts) order a metric client must
    // preserve matches the globally-ordered collected form; only the
    // interleaving ACROSS clusters may differ (independent endpoints)
    Seq("j-A", "j-B", "j-C").foreach { c =>
      assert(par.filter(_.contains(c)) == ep.lines.toSeq.filter(_.contains(c)),
        s"per-series order broken for $c")
    }
  }
}
