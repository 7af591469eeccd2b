package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.MetricPipeline

/** One metric tick — the engine's replacement for the reference's
  * curl → jq → bc → put-metric-data pipeline
  * (/root/reference/scripts/custom-metrics.sh): reads YARN-RM metrics JSON
  * payload files, computes YARNCoreAvailablePercentage with bc semantics
  * (scale-2 truncation, zero-core tick skipped), and prints the
  * put-metric-data fields. The HTTP poll and the CloudWatch client are
  * deployment concerns (SURVEY.md §7.5) — any file/stdin feed works.
  *
  * Usage: `runMain graft.MetricTickMain <payload.json|payload_dir> <jobFlowId>`
  */
object MetricTickMain {
  def main(args: Array[String]): Unit = {
    if (args.length != 2) {
      System.err.println("Usage: MetricTickMain <payload_json_path> <job_flow_id>")
      sys.exit(1)
    }
    val Array(path, jobFlowId) = args
    // spark-submit injects spark.master; default to local[*] otherwise
    val base = SparkSession.builder()
    val withMaster =
      if (sys.props.contains("spark.master")) base else base.master("local[*]")
    val spark = withMaster
      .appName("graft-metric-tick")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()

    // wholetext: one payload per FILE, so pretty-printed JSON works too
    val payloads = spark.read.option("wholetext", "true").text(path)
      .select(current_timestamp().as("ts"), col("value").as("payload"))
    val points = MetricPipeline.parseRmPayload(payloads, jobFlowId).collect()

    if (points.isEmpty) {
      // bc error on zero divisor kills the tick under set -e: no emission
      System.err.println("[tick] no metric emitted (zero total cores)")
    } else points.foreach { p =>
      println(s"put-metric-data --metric-name ${p.metric} " +
        s"--namespace AWS/ElasticMapReduce --unit Percent " +
        s"--value ${p.value} --dimensions JobFlowId=${p.clusterId}")
    }
    spark.stop()
  }
}
