package graft.streaming

import graft.SparkSuite
import graft.streaming.StreamTransitions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Golden epochs for the streaming transition extractor: pairs within a
  * batch follow (ts, eventId) order, the cross-batch boundary transition
  * is emitted (the thing a per-batch window join drops), state is
  * per-user, and the emitted pairs aggregate to exactly the batch
  * `q56_transition_matrix` counts on the same events. */
class StreamTransitionsSpec extends SparkSuite {
  import spark.implicits._

  private def runEpochs(name: String,
      epochs: Seq[Seq[UserEvent]]): Seq[Transition] = {
    MetricPipeline.ensureRocksDbStateStore(spark)
    val input = MemoryStream[UserEvent](spark)
    val q = transitions(input.toDS()).toDF()
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      epochs.foreach { e =>
        input.addData(e: _*)
        q.processAllAvailable()
      }
      spark.table(name).as[Transition].collect().toSeq
    } finally q.stop()
  }

  test("pairs follow (ts, eventId) order within a batch") {
    val out = runEpochs("trans_order", Seq(Seq(
      // arrival order deliberately scrambled vs (ts, eventId)
      UserEvent(1L, 300L, 3L, "buy"),
      UserEvent(1L, 100L, 1L, "view"),
      UserEvent(1L, 200L, 2L, "click"))))
    assert(out.map(t => (t.fromType, t.toType)) ===
      Seq(("view", "click"), ("click", "buy")))
  }

  test("ts ties break on eventId, like the batch window") {
    val out = runEpochs("trans_tie", Seq(Seq(
      UserEvent(1L, 100L, 2L, "click"),
      UserEvent(1L, 100L, 1L, "view"))))
    assert(out.map(t => (t.fromType, t.toType)) === Seq(("view", "click")))
  }

  test("cross-batch boundary transition is emitted from kept state") {
    val out = runEpochs("trans_boundary", Seq(
      Seq(UserEvent(1L, 100L, 1L, "view")),
      Seq(UserEvent(1L, 200L, 2L, "buy"))))
    assert(out.map(t => (t.fromType, t.toType)) === Seq(("view", "buy")))
  }

  test("state is per-user: interleaved users never cross-pair") {
    val out = runEpochs("trans_users", Seq(Seq(
      UserEvent(1L, 100L, 1L, "view"),
      UserEvent(2L, 150L, 2L, "buy"),
      UserEvent(1L, 200L, 3L, "click"))))
    assert(out.map(t => (t.userId, t.fromType, t.toType)) ===
      Seq((1L, "view", "click")))
  }

  test("emitted pairs aggregate to the batch transition counts") {
    // the parity gate: same events through the streaming path (split
    // across 3 epochs) and the batch lead() construction must produce
    // identical (from, to) -> count tables
    val events = Seq(
      UserEvent(1L, 100L, 1L, "view"), UserEvent(1L, 200L, 2L, "click"),
      UserEvent(1L, 300L, 3L, "view"), UserEvent(1L, 400L, 4L, "buy"),
      UserEvent(2L, 110L, 5L, "view"), UserEvent(2L, 210L, 6L, "view"),
      UserEvent(3L, 120L, 7L, "click"))
    val out = runEpochs("trans_parity",
      Seq(events.take(3), events.slice(3, 5), events.drop(5)))
    val streamed = out.groupBy(t => (t.fromType, t.toType))
      .map { case (k, v) => k -> v.size.toLong }
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(col("userId"))
      .orderBy(col("tsMicros"), col("eventId"))
    val batch = events.toDF()
      .withColumn("toType", lead(col("eventType"), 1).over(w))
      .where(col("toType").isNotNull)
      .groupBy(col("eventType"), col("toType")).count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(streamed === batch)
  }
}
