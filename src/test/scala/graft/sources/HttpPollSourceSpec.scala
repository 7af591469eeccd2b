package graft.sources

import java.net.InetSocketAddress
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.HttpServer

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** The poll source with an injectable transport: the live `http` path is
  * exercised offline against an in-process stub serving the YARN RM
  * `/ws/v1/cluster/metrics` JSON shape, and the default `replay` path
  * replays a recorded capture with identical downstream semantics. */
class HttpPollSourceSpec extends SparkSuite {

  /** In-process RM stand-in: each GET serves the cluster-metrics document
    * with a fresh availableVirtualCores so successive polls are
    * distinguishable. */
  private def withRmStub(f: (String, AtomicInteger) => Unit): Unit = {
    val hits = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/ws/v1/cluster/metrics", exchange => {
      val n = hits.incrementAndGet()
      val body =
        s"""{"clusterMetrics": {"appsRunning": 1, "availableVirtualCores": $n, "totalVirtualCores": 16}}"""
          .getBytes("UTF-8")
      exchange.getResponseHeaders.add("Content-Type", "application/json")
      exchange.sendResponseHeaders(200, body.length)
      exchange.getResponseBody.write(body)
      exchange.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/ws/v1/cluster/metrics", hits)
    finally server.stop(0)
  }

  test("HttpTransport fetches the RM document and stamps the poll time") {
    withRmStub { (url, _) =>
      val t = new HttpTransport(url, clock = () => 1700000123L)
      val Some((ts, payload)) = t.poll(): @unchecked
      assert(ts == 1700000123L)
      assert(payload.contains("\"availableVirtualCores\": 1"))
      val Some((_, p2)) = t.poll(): @unchecked
      assert(p2.contains("\"availableVirtualCores\": 2"))
    }
  }

  test("HttpTransport fails loudly on a non-200 endpoint") {
    withRmStub { (url, _) =>
      val dead = new HttpTransport(url.replace("/metrics", "/nope"))
      val ex = intercept[IllegalStateException](dead.poll())
      assert(ex.getMessage.contains("HTTP 404"))
    }
  }

  test("streams live polls end-to-end: one observation per trigger") {
    withRmStub { (url, _) =>
      val stream = spark.readStream.format("graft.sources.HttpPollSource")
        .option("transport", "http").option("url", url).load()
      assert(stream.schema.fieldNames.toSeq == Seq("ts", "payload"))
      val q = stream.writeStream.format("memory").queryName("http_out")
        .outputMode(OutputMode.Append)
        .trigger(Trigger.ProcessingTime(0L)).start()
      try {
        val deadline = System.currentTimeMillis() + 60000
        while (spark.table("http_out").count() < 5 &&
          System.currentTimeMillis() < deadline) Thread.sleep(100)
      } finally q.stop()
      val rows = spark.table("http_out")
        .select(get_json_object(col("payload"),
          "$.clusterMetrics.availableVirtualCores").cast("int").as("avail"))
        .collect().map(_.getInt(0)).toSeq
      assert(rows.size >= 5, s"only ${rows.size} polls landed")
      // one poll per trigger, appended in order: the stub's counter values
      assert(rows == (1 to rows.size), rows.mkString(","))
    }
  }

  test("the reference's full loop offline: HTTP poll -> bc percent -> put-metric-data") {
    // custom-metrics.sh end-to-end: poll the RM endpoint, compute the
    // scale-2 truncated percentage, publish the CLI field tuple — here as
    // one streaming query against the in-process stub
    withRmStub { (url, _) =>
      import graft.streaming.TestEndpoints
      TestEndpoints.clear("poll_pub")
      def lines = TestEndpoints.lines("poll_pub")
      val payloads = spark.readStream.format("graft.sources.HttpPollSource")
        .option("transport", "http").option("url", url).load()
      val ckpt = Files.createTempDirectory("graft_poll_pub").toString
      val q = graft.streaming.MetricPipeline.startPublish(
        payloads, "j-LIVE", ckpt, TestEndpoints.Factory("poll_pub"),
        Trigger.ProcessingTime(0L))
      try {
        val deadline = System.currentTimeMillis() + 60000
        while (lines.size < 3 && System.currentTimeMillis() < deadline)
          Thread.sleep(100)
      } finally q.stop()
      assert(lines.size >= 3, s"only ${lines.size} publications landed")
      // poll 1 served availableVirtualCores=1 of 16: bc scale=2 -> 6.25
      assert(lines.head ==
        """{"action":"put-metric-data","metric-name":"YARNCoreAvailablePercentage","namespace":"AWS/ElasticMapReduce","unit":"Percent","value":6.25,"dimensions":["JobFlowId=j-LIVE"]}""",
        lines.head)
    }
  }

  test("restart guards: clean restart fast-forwards, unreplayable ranges fail loudly") {
    val f = Files.createTempFile("graft_poll_restart", ".jsonl")
    Files.writeString(f, (0 until 8).map { i =>
      s"""{"ts": ${1700000000L + i}, "payload": "p$i"}"""
    }.mkString("\n"))
    val s = new HttpPollMicroBatchStream(new ReplayTransport(f.toString))
    // the engine's actual restart order (MicroBatchExecution +
    // SupportsAdmissionControl): the checkpointed start arrives via
    // latestOffset(start, limit) BEFORE the first poll — fresh
    // observations must continue the numbering from there, not restart
    // at 0 and collide with committed indices. The replay transport
    // additionally SEEKS past the 5 committed observations, so the first
    // fresh poll serves p5 — not a renumbered duplicate of p0.
    val end = s.latestOffset(s.deserializeOffset("5"),
      org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
    assert(end.json == "6")
    // the engine then commits the restored offset (cleanUpLastExecutedMicroBatch)
    // — that must not drop the fresh never-served observation
    s.commit(s.deserializeOffset("5"))
    val parts = s.planInputPartitions(s.deserializeOffset("5"), end)
    assert(parts.length == 1)
    assert(parts(0).asInstanceOf[PollPartition].rows.map(_._2).toSeq ==
      Seq("p5"), "restart must resume the capture, not re-serve its head")
    // a replay below the retained tail (committed-but-lost observations)
    // must fail loudly, never serve an empty slice
    val exLow = intercept[IllegalStateException](
      s.planInputPartitions(s.deserializeOffset("0"), s.deserializeOffset("2")))
    assert(exLow.getMessage.contains("not replayable"))
    // and so must a range past anything this process ever polled
    val exHigh = intercept[IllegalStateException](
      s.planInputPartitions(s.deserializeOffset("6"), s.deserializeOffset("8")))
    assert(exHigh.getMessage.contains("not replayable"))
  }

  test("a capture shorter than the committed offset fails the seek loudly") {
    // the restart contract assumes the capture only grows; a replaced or
    // truncated file would otherwise re-serve its tail under fresh
    // offsets — the silent duplication seek exists to prevent
    val f = Files.createTempFile("graft_poll_trunc", ".jsonl")
    Files.writeString(f, (0 until 3).map { i =>
      s"""{"ts": ${1700000000L + i}, "payload": "p$i"}"""
    }.mkString("\n"))
    val t = new ReplayTransport(f.toString)
    t.seek(3) // exactly at the end: every committed row is present — fine
    assert(t.poll().isEmpty)
    val ex = intercept[IllegalStateException](t.seek(4))
    assert(ex.getMessage.contains("replaced or truncated"), ex.getMessage)
  }

  test("checkpointed restart through the real engine continues the numbering") {
    // regression: with a plain MicroBatchStream the engine polls
    // latestOffset() BEFORE deserializing the checkpointed offset, so the
    // restart fast-forward never fired, the first fresh observation was
    // dropped, and the regressed offset crash-looped the query. The
    // SupportsAdmissionControl overload receives the restored start first;
    // this drives a real stop/restart cycle through MicroBatchExecution.
    val f = Files.createTempFile("graft_poll_ckpt", ".jsonl")
    Files.writeString(f, (0 until 20).map { i =>
      s"""{"ts": ${1700000000L + i}, "payload": "p$i"}"""
    }.mkString("\n"))
    val ckpt = Files.createTempDirectory("graft_poll_ckpt_dir").toString
    val seen = new java.util.concurrent.CopyOnWriteArrayList[String]()
    def run(minRows: Int): Unit = {
      val q = spark.readStream.format("graft.sources.HttpPollSource")
        .option("path", f.toString).load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.collect().foreach(r => seen.add(r.getString(1)))
        }
        .trigger(Trigger.ProcessingTime(0L)).start()
      try {
        val deadline = System.currentTimeMillis() + 60000
        while (seen.size < minRows && System.currentTimeMillis() < deadline)
          Thread.sleep(100)
        // the capture (or target) is drained: give the in-flight commit a
        // beat to land so the stop is a clean between-batches shutdown
        Thread.sleep(500)
      } finally q.stop()
      assert(q.exception.isEmpty, q.exception.map(_.toString).getOrElse(""))
      assert(seen.size >= minRows, s"only ${seen.size} of $minRows rows landed")
    }
    run(20) // first run drains the whole capture and commits offset 20
    // the capture grows while the query is down (the recorded feed keeps
    // appending), then a restart against the same checkpoint: the fresh
    // transport SEEKS past the 20 committed observations and serves only
    // the new tail — nothing is re-served under new offsets
    Files.writeString(f, "\n" + (20 until 23).map { i =>
      s"""{"ts": ${1700000000L + i}, "payload": "p$i"}"""
    }.mkString("\n"), java.nio.file.StandardOpenOption.APPEND)
    run(23)
    assert(seen.asScala.toSeq == (0 until 23).map(i => s"p$i"),
      s"restart duplicated or dropped rows: ${seen.asScala.toSeq}")
  }

  test("replay transport is the default and drains the capture exactly once") {
    val f = Files.createTempFile("graft_poll_replay", ".jsonl")
    val lines = (0 until 7).map { i =>
      s"""{"ts": ${1700000000L + i * 30}, "payload": "{\\"clusterMetrics\\": {\\"availableVirtualCores\\": $i, \\"totalVirtualCores\\": 16}}"}"""
    }
    Files.writeString(f, lines.mkString("\n"))
    val q = spark.readStream.format("graft.sources.HttpPollSource")
      .option("path", f.toString).load()
      .writeStream.format("memory").queryName("poll_replay_out")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime(0L)).start()
    try {
      val deadline = System.currentTimeMillis() + 60000
      while (spark.table("poll_replay_out").count() < 7 &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
    } finally q.stop()
    assert(spark.table("poll_replay_out").count() == 7)
    val firstTs = spark.table("poll_replay_out").agg(min(col("ts")))
      .collect()(0).getTimestamp(0).getTime / 1000
    assert(firstTs == 1700000000L)
  }
}
