package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSuite
import graft.streaming.MetricPipeline.MetricPoint
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Checkpoint recovery: stop the windowed-aggregation query mid-stream and
  * restart it from the same checkpoint — the rebuilt query must resume
  * from committed offsets and emit each closed window EXACTLY once across
  * both runs (the operational property the 30 s production trigger relies
  * on; SURVEY §5.2). The sink is foreachBatch (the memory sink refuses
  * recovery), mirroring the production metric sink's shape. */
class RecoverySpec extends SparkSuite {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  test("windowed aggregation resumes from checkpoint without re-emitting") {
    val ckpt = Files.createTempDirectory("graft-recovery").toString
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Double, Long)]
    val input = MemoryStream[MetricPoint](spark)
    def start() = MetricPipeline
      .windowAvg(input.toDS(), window_ = "5 minutes", slide = "5 minutes",
        watermark = "1 minute")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.select("win_start", "avg_value", "n_obs").collect().foreach(r =>
          emitted.add((r.getTimestamp(0).getTime / 1000,
            r.getDouble(1), r.getLong(2))))
      }
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()

    val q1 = start()
    try {
      input.addData(
        MetricPoint(ts(10), "j-1", "m", 10.0),
        MetricPoint(ts(100), "j-1", "m", 30.0))
      q1.processAllAvailable()
      // advance the watermark past window [0,300) so it closes and emits
      input.addData(MetricPoint(ts(700), "j-1", "m", 50.0))
      q1.processAllAvailable()
      assert(emitted.size === 1)
    } finally q1.stop()

    // restart from the same checkpoint; in-flight window [600,900) is
    // restored state, not re-read input
    val q2 = start()
    try {
      input.addData(MetricPoint(ts(800), "j-1", "m", 70.0))
      q2.processAllAvailable()
      input.addData(MetricPoint(ts(2000), "j-1", "m", 1.0)) // close [600,900)
      q2.processAllAvailable()
      val rows = emitted.toArray(Array.empty[(Long, Double, Long)])
        .sortBy(_._1).toSeq
      // window [0,300) appears ONCE (from run 1, not re-emitted); window
      // [600,900) merges pre-restart state (50.0) with post-restart (70.0)
      assert(rows === Seq((0L, 20.0, 2L), (600L, 60.0, 2L)), rows)
    } finally q2.stop()
  }
}
