package graft.streaming

import graft.SparkSuite
import graft.streaming.StreamTopK._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Golden epochs for the MapState streaming top-k: counts accumulate
  * across micro-batches, the emitted top-k reflects state (not just the
  * batch), ranks are total-ordered. */
class StreamTopKSpec extends SparkSuite {
  import spark.implicits._

  private def drain(name: String): Seq[(String, String, Long, Long)] =
    spark.table(name).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq

  test("counts accumulate across epochs; top-k is state-wide, ties break on item") {
    MetricPipeline.ensureRocksDbStateStore(spark)
    val input = MemoryStream[ItemEvent](spark)
    val q = topK(input.toDS(), k = 2).toDF()
      .writeStream.format("memory").queryName("topk_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        ItemEvent("en", "a"), ItemEvent("en", "a"), ItemEvent("en", "b"))
      q.processAllAvailable()
      val e1 = drain("topk_out")
      assert(e1 == Seq(("en", "a", 2L, 1L), ("en", "b", 1L, 2L)))

      // epoch 2: b overtakes a; c enters but stays below top-2; the
      // emitted rows must reflect TOTAL counts, proving state persisted
      input.addData(
        ItemEvent("en", "b"), ItemEvent("en", "b"),
        ItemEvent("en", "c"), ItemEvent("fr", "x"))
      q.processAllAvailable()
      val e2 = drain("topk_out").diff(e1)
      assert(e2.toSet == Set(
        ("en", "b", 3L, 1L), ("en", "a", 2L, 2L), ("fr", "x", 1L, 1L)))
    } finally q.stop()
  }

  test("untouched groups stay silent; restarted counts come from the store") {
    MetricPipeline.ensureRocksDbStateStore(spark)
    val input = MemoryStream[ItemEvent](spark)
    val q = topK(input.toDS(), k = 1).toDF()
      .writeStream.format("memory").queryName("topk_out2")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(ItemEvent("de", "z"))
      q.processAllAvailable()
      input.addData(ItemEvent("it", "y")) // 'de' untouched this batch
      q.processAllAvailable()
      val rows = drain("topk_out2")
      assert(rows.count(_._1 == "de") == 1) // no re-emission without input
      assert(rows.contains(("it", "y", 1L, 1L)))
    } finally q.stop()
  }

  test("item-cardinality cap fails loudly instead of growing state") {
    MetricPipeline.ensureRocksDbStateStore(spark)
    val input = MemoryStream[ItemEvent](spark)
    val q = topK(input.toDS(), k = 1, maxItems = 3).toDF()
      .writeStream.format("memory").queryName("topk_out3")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((1 to 5).map(i => ItemEvent("en", s"w$i")): _*)
      val ex = intercept[Exception](q.processAllAvailable())
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e =>
          Option(e.getMessage).toSeq ++ msgs(e.getCause))
      assert((msgs(ex) ++ Option(q.exception.map(_.toString).getOrElse("")))
        .exists(_.contains("stream_topk")), ex.toString)
    } finally q.stop()
  }
}
