package graft.sources

import java.nio.file.Files

import graft.SparkSuite
import graft.streaming.MetricPipeline
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** The custom DSv2 micro-batch source must respect its rate limit, expose
  * the declared schema, and drive the full metric pipeline end-to-end
  * (replacing the reference's cron poll loop). */
class ReplaySourceSpec extends SparkSuite {

  private def writeTrace(n: Int): String = {
    val f = Files.createTempFile("graft_replay", ".jsonl")
    val lines = (0 until n).map { i =>
      val avail = if (i < n / 2) 2 else 15
      s"""{"ts": ${1700000000L + i * 30}, "payload": "{\\"clusterMetrics\\": {\\"availableVirtualCores\\": $avail, \\"totalVirtualCores\\": 16}}"}"""
    }
    Files.writeString(f, lines.mkString("\n"))
    f.toString
  }

  test("replays all rows with the declared schema, rate-limited per batch") {
    val path = writeTrace(25)
    val stream = spark.readStream.format("graft.sources.ReplaySource")
      .option("path", path).option("maxRowsPerBatch", "10").load()
    assert(stream.schema.fieldNames.toSeq == Seq("ts", "payload"))
    val q = stream.writeStream.format("memory").queryName("replay_out")
      .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val n = spark.table("replay_out").count()
    assert(n == 25, s"expected 25 replayed rows, got $n")
    // rate limit => at least 3 micro-batches
    assert(q.recentProgress.count(_.numInputRows > 0) >= 3,
      q.recentProgress.map(_.numInputRows).mkString(","))
    val firstTs = spark.table("replay_out").agg(min(col("ts"))).collect()(0)
      .getTimestamp(0).getTime / 1000
    assert(firstTs == 1700000000L)
  }

  test("payload-last guard: escaped quote passes, escaped backslash still trips") {
    // an escaped quote inside the payload is NOT a closing quote — the
    // guard must not false-positive on the `\", \"x\":` shape
    val (_, p) = ReplaySource.parseLine("""{"ts": 1, "payload": "a\", \"x\": 1"}""")
    assert(p == """a", "x": 1""")
    // a payload ending in an escaped BACKSLASH is a real closing quote
    // (even backslash count) — a trailing key after it must stay loud
    val ex = intercept[IllegalArgumentException](
      ReplaySource.parseLine("""{"ts": 1, "payload": "abc\\", "extra": 1}"""))
    assert(ex.getMessage.contains("payload must be last"))
  }

  test("payload-last guard: raw JSON-object payloads with interior keys pass") {
    // an object payload whose string value is followed by another key is
    // well-formed by the parser's own contract — the `", "id":` inside the
    // object is payload content, not a trailing key
    val (_, p) = ReplaySource.parseLine(
      """{"ts": 1, "payload": {"state": "RUNNING", "id": 5}}""")
    assert(p == """{"state": "RUNNING", "id": 5}""")
    // a key after the object's real closing brace must still trip
    val ex = intercept[IllegalArgumentException](
      ReplaySource.parseLine("""{"ts": 1, "payload": {"a": 1}, "extra": 2}"""))
    assert(ex.getMessage.contains("payload must be last"))
    // interior escaped quotes don't end the object's string literals
    val (_, p2) = ReplaySource.parseLine(
      """{"ts": 1, "payload": {"s": "a\"b", "n": 2}}""")
    assert(p2 == """{"s": "a\"b", "n": 2}""")
  }

  test("checkpoint recovery: restart resumes from the committed offset") {
    val path = writeTrace(30)
    val ckpt = Files.createTempDirectory("graft_ck_rec").toString
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    def run(maxBatches: Int): Unit = {
      val q = spark.readStream.format("graft.sources.ReplaySource")
        .option("path", path).option("maxRowsPerBatch", "7").load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epoch: Long) =>
          if (epoch < maxBatches)
            batch.collect().foreach(r => seen.add(r.getTimestamp(0).getTime))
          else throw new RuntimeException("injected failure")
          ()
        }.start()
      try q.awaitTermination(60000)
      catch { case _: Throwable => () }
    }
    run(maxBatches = 2)   // fails mid-stream after 2 committed batches
    run(Int.MaxValue)     // restart from checkpoint, drain the rest
    assert(seen.size == 30, s"expected 30 distinct rows, got ${seen.size}")
  }

  test("drives the metric pipeline end-to-end (parse -> window -> decide)") {
    val path = writeTrace(40)
    val payloads = spark.readStream.format("graft.sources.ReplaySource")
      .option("path", path).option("maxRowsPerBatch", "20").load()
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val ckpt = Files.createTempDirectory("graft_replay_ckpt").toString
    val q = MetricPipeline.start(payloads, "j-REPLAY",
      (batch, _) => { seen.addAndGet(batch.count()); () },
      ckpt, Trigger.AvailableNow())
    q.awaitTermination(120000)
    assert(seen.get() >= 1) // low-core phase must fire at least one scale-out
  }
}
