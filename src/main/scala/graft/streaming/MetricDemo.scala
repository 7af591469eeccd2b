package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Runnable demo of the streaming metric pipeline — the engine's
  * re-expression of the reference's cron→curl→jq→bc→CloudWatch loop
  * (SURVEY.md §3.2): a directory of RM-metrics JSON payloads plays the
  * poll source; the query windows, classifies and applies the stateful
  * cooldown/clamp, printing scaling actions.
  *
  * Usage: `sbt "runMain graft.streaming.MetricDemo"` — writes a simulated
  * load trace (100%→low→recover) and prints the resulting actions.
  */
object MetricDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-metric-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Files.createTempDirectory("graft_demo")
    val srcDir = base.resolve("payloads"); Files.createDirectories(srcDir)
    val ckpt = base.resolve("ckpt").toString

    // Simulated trace at the reference's 30 s cadence: idle cluster (all
    // cores free), then a heavy job pins the cores (available% ≤ 25 →
    // scale-out), then load drains (> 75 → scale-in).
    val t0 = 1700000000L
    val trace = (0 until 60).map { i =>
      val (avail, total) = i match {
        case j if j < 10 => (16, 16)   // idle: 100%
        case j if j < 40 => (2, 16)    // busy: 12.5% → scale-out territory
        case _           => (15, 16)   // drained: 93.75% → scale-in
      }
      val ts = t0 + i * 30
      s"""{"ts": $ts, "payload": "{\\"clusterMetrics\\": {\\"availableVirtualCores\\": $avail, \\"totalVirtualCores\\": $total}}"}"""
    }
    Files.writeString(srcDir.resolve("trace.jsonl"), trace.mkString("\n"))

    // the custom DSv2 replay source stands in for the reference's
    // cron+curl poll loop, rate-limited to one "tick" batch per trigger
    val payloads = spark.readStream
      .format("graft.sources.ReplaySource")
      .option("path", srcDir.resolve("trace.jsonl").toString)
      .option("maxRowsPerBatch", "20")
      .load()

    val q = MetricPipeline.start(
      payloads, "j-DEMO",
      (batch, epoch) => {
        val acts = batch.orderBy("atSec").collect()
        acts.foreach { r =>
          println(f"[demo] epoch=$epoch action=${r.getAs[String]("rule")}%-10s " +
            f"at=${r.getAs[Long]("atSec")} capacity ${r.getAs[Int]("from")}%2d -> ${r.getAs[Int]("to")}%2d")
        }
      },
      ckpt, Trigger.AvailableNow())
    q.awaitTermination(120000)
    spark.stop()
  }
}
