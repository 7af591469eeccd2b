package graft.streaming

import java.sql.Timestamp

import graft.SparkSuite
import graft.streaming.StreamSession._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Event-time-timer goldens: summaries emit only when the WATERMARK
  * passes lastSeen + gap, activity slides the deadline, and closed
  * sessions clear their state. */
class StreamSessionSpec extends SparkSuite {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  private def startQuery(input: MemoryStream[UserEvent], name: String) = {
    MetricPipeline.ensureRocksDbStateStore(spark)
    sessionSummaries(
      input.toDS().withWatermark("ts", "0 seconds").as[UserEvent],
      gapMs = 60000L)
      .toDF().writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
  }

  private def rows(name: String): Seq[(String, Long, Double, Long, Long)] =
    spark.table(name).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4))).toSeq

  test("summary emits only after the watermark passes the session gap") {
    val input = MemoryStream[UserEvent](spark)
    val q = startQuery(input, "sess_out")
    try {
      input.addData(UserEvent("u1", ts(10), 2.0), UserEvent("u1", ts(30), 3.0))
      q.processAllAvailable()
      assert(rows("sess_out").isEmpty) // watermark (30s) < deadline (90s)

      // activity at 80s slides the deadline to 140s; watermark 80s — still open
      input.addData(UserEvent("u1", ts(80), 5.0))
      q.processAllAvailable()
      assert(rows("sess_out").isEmpty)

      // another user's late-arriving activity pushes the watermark past
      // 140s -> u1's timer fires with the TOTAL session accumulation
      input.addData(UserEvent("u2", ts(200), 1.0))
      q.processAllAvailable()
      input.addData(UserEvent("u2", ts(400), 1.0)) // advance watermark again
      q.processAllAvailable()
      val out = rows("sess_out")
      assert(out.contains(("u1", 3L, 10.0, 10000L, 80000L)), out)
    } finally q.stop()
  }

  test("closed session clears state: the next event starts a fresh session") {
    val input = MemoryStream[UserEvent](spark)
    val q = startQuery(input, "sess_out2")
    try {
      input.addData(UserEvent("u1", ts(10), 1.0))
      q.processAllAvailable()
      input.addData(UserEvent("u9", ts(500), 0.0)) // close u1's session
      q.processAllAvailable()
      input.addData(UserEvent("u1", ts(600), 7.0)) // new session for u1
      q.processAllAvailable()
      input.addData(UserEvent("u9", ts(900), 0.0)) // close it too
      q.processAllAvailable()
      val u1 = rows("sess_out2").filter(_._1 == "u1")
      assert(u1.toSet == Set(
        ("u1", 1L, 1.0, 10000L, 10000L),
        ("u1", 1L, 7.0, 600000L, 600000L)), u1)
    } finally q.stop()
  }

  test("two bursts in ONE micro-batch split into two sessions") {
    // the arrival-batching independence property: the same events must
    // produce the same sessions whether they land in one batch or many —
    // without the in-batch gap check, these merged into one session
    val input = MemoryStream[UserEvent](spark)
    val q = startQuery(input, "sess_out3")
    try {
      input.addData(
        UserEvent("u1", ts(10), 1.0), UserEvent("u1", ts(20), 2.0),
        UserEvent("u1", ts(500), 4.0)) // > 60s after the first burst
      q.processAllAvailable()
      // the first burst closes IMMEDIATELY (a later event proves the gap)
      assert(rows("sess_out3").contains(("u1", 2L, 3.0, 10000L, 20000L)),
        rows("sess_out3"))
      // the second session needs the watermark: close it via another user
      input.addData(UserEvent("u9", ts(900), 0.0))
      q.processAllAvailable()
      val u1 = rows("sess_out3").filter(_._1 == "u1")
      assert(u1.toSet == Set(
        ("u1", 2L, 3.0, 10000L, 20000L),
        ("u1", 1L, 4.0, 500000L, 500000L)), u1)
    } finally q.stop()
  }
}
