package graft.streaming

import graft.SparkSuite
import graft.streaming.StreamAnomaly._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Golden epochs for the streaming z-score detector: warm-up stays
  * silent, spikes flag against state accumulated in EARLIER epochs, the
  * ring evicts past the window, and series are independent. */
class StreamAnomalySpec extends SparkSuite {
  import spark.implicits._

  // alternating 9/11 baseline: mean 10, variance 1 — a 100 reads z = 90
  private def baseline(n: Int, from: Int = 0): Seq[MetricEvent] =
    (from until from + n).map(i =>
      MetricEvent("cpu", i.toLong * 1000, i.toLong, if (i % 2 == 0) 9.0 else 11.0))

  private def drain(name: String): Seq[AnomalyRow] =
    spark.table(name).as[AnomalyRow].collect().toSeq

  test("warm-up emits nothing; a spike flags against prior-epoch state") {
    MetricPipeline.ensureRocksDbStateStore(spark)
    val input = MemoryStream[MetricEvent](spark)
    val q = anomalies(input.toDS()).toDF()
      .writeStream.format("memory").queryName("anom_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(baseline(12): _*)
      q.processAllAvailable()
      assert(drain("anom_out").isEmpty) // nothing beyond |z| = 1

      // the spike arrives in a LATER epoch: flagging it proves the ring
      // survived in the state store
      input.addData(MetricEvent("cpu", 12000, 12, 100.0))
      q.processAllAvailable()
      val rows = drain("anom_out")
      assert(rows.map(_.eventId) == Seq(12L))
      val r = rows.head
      assert(r.n == 12 && math.abs(r.mean - 10.0) < 1e-9 && r.z > 80, r.toString)
    } finally q.stop()
  }

  test("the spike itself joins the ring and widens the variance after it") {
    MetricPipeline.ensureRocksDbStateStore(spark)
    val input = MemoryStream[MetricEvent](spark)
    val q = anomalies(input.toDS()).toDF()
      .writeStream.format("memory").queryName("anom_out2")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(baseline(12) :+ MetricEvent("cpu", 12000, 12, 100.0): _*)
      q.processAllAvailable()
      val first = drain("anom_out2")
      assert(first.map(_.eventId) == Seq(12L))
      // next value at 11 is ordinary once the 100 inflated the stddev
      input.addData(MetricEvent("cpu", 13000, 13, 11.0))
      q.processAllAvailable()
      assert(drain("anom_out2").size == first.size)
    } finally q.stop()
  }

  test("ring evicts past the window: old spike stops polluting the stats") {
    MetricPipeline.ensureRocksDbStateStore(spark)
    val input = MemoryStream[MetricEvent](spark)
    // window 4, minObs 3: tiny ring so eviction is quick to exercise
    val q = anomalies(input.toDS(), window = 4, minObs = 3).toDF()
      .writeStream.format("memory").queryName("anom_out3")
      .outputMode(OutputMode.Append).start()
    try {
      // 9,11,9,100 fill the ring; then four baseline values push 100 out
      input.addData(baseline(3) :+ MetricEvent("cpu", 3000, 3, 100.0): _*)
      q.processAllAvailable()
      input.addData(baseline(4, from = 4): _*)
      q.processAllAvailable()
      val n1 = drain("anom_out3").size
      // with the 100 evicted, the ring is 9/11s again: a fresh 100 flags
      input.addData(MetricEvent("cpu", 8000, 8, 100.0))
      q.processAllAvailable()
      val rows = drain("anom_out3")
      assert(rows.size == n1 + 1 && rows.last.eventId == 8L,
        rows.mkString("\n"))
    } finally q.stop()
  }

  test("series are independent: one series' spike never flags another") {
    MetricPipeline.ensureRocksDbStateStore(spark)
    val input = MemoryStream[MetricEvent](spark)
    val q = anomalies(input.toDS(), window = 4, minObs = 3).toDF()
      .writeStream.format("memory").queryName("anom_out4")
      .outputMode(OutputMode.Append).start()
    try {
      val mem = (0 until 4).map(i =>
        MetricEvent("mem", i.toLong * 1000, 100L + i, if (i % 2 == 0) 9.0 else 11.0))
      input.addData(baseline(4) ++ mem: _*)
      q.processAllAvailable()
      input.addData(MetricEvent("mem", 9000, 109, 100.0))
      q.processAllAvailable()
      val rows = drain("anom_out4")
      assert(rows.map(r => (r.series, r.eventId)) == Seq(("mem", 109L)), rows.mkString("\n"))
    } finally q.stop()
  }
}
