package graft.streaming

import java.nio.file.Files
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import graft.SparkSuite
import graft.state.Scaling
import graft.state.Scaling._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The reference's full story as one test: ReplaySource → parse →
  * window-avg → threshold → transformWithState cooldown/clamp → sink,
  * replaying the README demo trace (load → +5 scale-out → suppressed
  * fires during cooldown → scale-in), with a crash and checkpoint
  * restart in the middle of the stream.
  *
  * The expected sequence is NOT hand-coded: it is the pure
  * [[Scaling.run]] fold over the batch-computed window averages (the
  * same window spec, restricted to windows the final watermark emits) —
  * an independent oracle, since the streaming path goes through
  * watermarks, micro-batch boundaries and the state store. Emission
  * order across micro-batches is monotone in window end, so the two must
  * agree action-for-action. */
class AutoscaleReplaySpec extends SparkSuite {

  private case class Act(rule: String, atSec: Long, from: Int, to: Int)

  /** Pure-fold oracle over the trace: batch windows → watermark cut →
    * Scaling.run. */
  private def expectedActions(payloads: DataFrame): Seq[Act] = {
    val points = MetricPipeline.parseRmPayload(payloads, "j-README")
    val maxTs = points.toDF().agg(max(unix_timestamp(col("ts"))))
      .collect()(0).getLong(0)
    val events = MetricPipeline.windowAvg(points)
      .filter(unix_timestamp(col("win_end")) <= maxTs - 600) // watermark cut
      .select(col("clusterId"), unix_timestamp(col("win_end")).as("e"),
        col("avg_value"))
      .collect()
      .map(r => WindowAvg(r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    val (_, actions) = Scaling.run(referenceRules, referenceConstraints,
      ClusterState(1, Map.empty), events)
    actions.map(a => Act(a.rule, a.atSec, a.from, a.to))
  }

  test("README demo trace: scale-out, cooldown suppression, scale-in — across a restart") {
    val base = Files.createTempDirectory("graft_autoscale")
    val trace = base.resolve("trace.jsonl")
    Files.writeString(trace, MetricDemo.demoTrace.mkString("\n"))
    val ckpt = base.resolve("ckpt").toString

    def payloadStream = spark.readStream.format("graft.sources.ReplaySource")
      .option("path", trace.toString).option("maxRowsPerBatch", "20").load()

    // exactly-once keyed by (rule, atSec): a replayed epoch after the
    // crash re-delivers the same actions (state comes from the checkpoint)
    val got = new ConcurrentHashMap[(String, Long), (Int, Int)]()
    def run(failAtEpoch: Long): Unit = {
      val q = MetricPipeline.start(payloadStream, "j-README",
        (batch: DataFrame, epoch: Long) => {
          if (epoch == failAtEpoch) throw new RuntimeException("injected crash")
          batch.collect().foreach { r =>
            got.put((r.getAs[String]("rule"), r.getAs[Long]("atSec")),
              (r.getAs[Int]("from"), r.getAs[Int]("to")))
          }
          ()
        },
        ckpt, Trigger.AvailableNow())
      try q.awaitTermination(120000)
      catch { case _: Throwable => () }
    }
    run(failAtEpoch = 3L) // crash mid-stream, after some committed batches
    run(failAtEpoch = -1L) // restart from the checkpoint, drain the rest

    val streamed = got.asScala.toSeq
      .map { case ((rule, at), (from, to)) => Act(rule, at, from, to) }
      .sortBy(_.atSec)
    val expected = expectedActions(
      spark.read.format("json")
        .schema("ts LONG, payload STRING").load(trace.toString)
        .select(col("ts").cast("timestamp").as("ts"), col("payload")))

    assert(expected.nonEmpty, "oracle fold produced no actions — trace broken")
    assert(streamed == expected,
      s"streamed:\n${streamed.mkString("\n")}\nexpected:\n${expected.mkString("\n")}")

    // the README narrative, asserted on the agreed sequence:
    // 1. the first action is the +5 scale-out
    assert(expected.head.rule == "scale-out" &&
      expected.head.to - expected.head.from == 5, expected.head.toString)
    // 2. cooldown SUPPRESSED fires: more low windows than scale-outs
    val lowWindows = {
      val points = MetricPipeline.parseRmPayload(
        spark.read.format("json").schema("ts LONG, payload STRING")
          .load(trace.toString)
          .select(col("ts").cast("timestamp").as("ts"), col("payload")),
        "j-README")
      MetricPipeline.windowAvg(points).filter(col("avg_value") <= 25).count()
    }
    val outs = expected.count(_.rule == "scale-out")
    assert(outs >= 2, s"only $outs scale-outs — no repeated fire after cooldown")
    assert(lowWindows > outs,
      s"$lowWindows low windows but $outs fires — nothing was suppressed")
    // 3. the drain phase ends in a scale-in
    assert(expected.last.rule == "scale-in" &&
      expected.last.from - expected.last.to == 2, expected.last.toString)
  }
}
