package graft.streaming

import graft.SparkSuite
import graft.streaming.StreamDrift._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Golden epochs for the streaming drift monitor: counts accumulate
  * across micro-batches per type, a baseline-conforming stream scores
  * PSI ≈ 0, a skewed stream crosses the 0.2 alert threshold, and the
  * assembly handles types unseen on either side. */
class StreamDriftSpec extends SparkSuite {
  import spark.implicits._

  private val baseline = Map("view" -> 0.5, "click" -> 0.3, "buy" -> 0.2)

  private def mkEvents(counts: Map[String, Int], from: Long): Seq[TypedEvent] =
    counts.toSeq.sortBy(_._1).flatMap { case (t, n) =>
      (0 until n).map(i => TypedEvent(t, from + i, from + i))
    }

  private def runEpochs(name: String,
      epochs: Seq[Map[String, Int]]): Seq[CountRow] = {
    MetricPipeline.ensureRocksDbStateStore(spark)
    val input = MemoryStream[TypedEvent](spark)
    val q = counts(input.toDS()).toDF()
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      epochs.zipWithIndex.foreach { case (e, i) =>
        input.addData(mkEvents(e, i * 100000L): _*)
        q.processAllAvailable()
      }
      spark.table(name).as[CountRow].collect().toSeq
    } finally q.stop()
  }

  test("counts accumulate across micro-batches, independently per type") {
    val log = runEpochs("drift_acc", Seq(
      Map("view" -> 5, "click" -> 3),
      Map("view" -> 2, "buy" -> 4)))
    val latest = log.groupBy(_.eventType)
      .map { case (t, rs) => t -> rs.map(_.nCum).max }
    assert(latest === Map("view" -> 7L, "click" -> 3L, "buy" -> 4L))
    // the changelog shows the epoch-1 partial for view, not just the end
    assert(log.exists(r => r.eventType == "view" && r.nCum == 5L))
  }

  test("baseline-conforming stream stays under the alert threshold") {
    val log = runEpochs("drift_ok", Seq(
      Map("view" -> 50, "click" -> 30, "buy" -> 20),
      Map("view" -> 50, "click" -> 30, "buy" -> 20)))
    val (total, terms) = psi(log, baseline)
    assert(total < 0.05, s"conforming stream drifted: $total ($terms)")
    assert(terms.values.forall(_ >= 0.0))
  }

  test("skewed stream crosses the 0.2 investigate threshold") {
    val log = runEpochs("drift_bad", Seq(
      Map("view" -> 95, "click" -> 3, "buy" -> 2)))
    val (total, terms) = psi(log, baseline)
    assert(total >= 0.2, s"skew not flagged: $total ($terms)")
    // the overrepresented type carries a positive term
    assert(terms("view") > 0.0)
  }

  test("types unseen in the baseline or the stream stay finite") {
    val log = Seq(CountRow("novel", 100L))
    val (total, terms) = psi(log, baseline)
    assert(java.lang.Double.isFinite(total))
    assert(terms.keySet === Set("novel", "view", "click", "buy"))
    assert(terms.values.forall(java.lang.Double.isFinite))
    assert(total >= 0.2, s"an all-novel stream must alert: $total")
  }
}
