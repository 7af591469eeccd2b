package graft.streaming

import graft.SparkSuite
import graft.streaming.StreamLate._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Golden epochs for the streaming lateness profiler: an event is late
  * exactly when its ts precedes the max event-time of PRIOR micro-batches
  * of its type (the micro-batch is the batch query's 100-event block),
  * within-batch disorder is invisible by contract, state is per-type, and
  * a multi-epoch replay matches an explicit fold of the same rule. */
class StreamLateSpec extends SparkSuite {
  import spark.implicits._

  private def runEpochs(name: String,
      epochs: Seq[Seq[TypedEvent]]): Seq[LateSummary] = {
    MetricPipeline.ensureRocksDbStateStore(spark)
    val input = MemoryStream[TypedEvent](spark)
    val q = lateness(input.toDS()).toDF()
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      epochs.foreach { e =>
        input.addData(e: _*)
        q.processAllAvailable()
      }
      spark.table(name).as[LateSummary].collect().toSeq
    } finally q.stop()
  }

  test("first batch is never late (no prior watermark)") {
    val out = runEpochs("late_first", Seq(Seq(
      TypedEvent("click", 300L, 1L), TypedEvent("click", 100L, 2L))))
    assert(out === Seq(LateSummary("click", 2L, 0L, 0L)))
  }

  test("within-batch disorder is invisible; cross-batch lateness is exact") {
    val out = runEpochs("late_cross", Seq(
      Seq(TypedEvent("click", 500L, 1L)),
      // 2 of 3 precede the prior-batch max (500); worst is 500-100=400
      Seq(TypedEvent("click", 100L, 2L), TypedEvent("click", 450L, 3L),
        TypedEvent("click", 600L, 4L))))
    assert(out.toSet === Set(
      LateSummary("click", 1L, 0L, 0L),
      LateSummary("click", 3L, 2L, 400L)))
  }

  test("the watermark never regresses on a late-only batch") {
    val out = runEpochs("late_mono", Seq(
      Seq(TypedEvent("click", 500L, 1L)),
      Seq(TypedEvent("click", 100L, 2L)),   // late, max stays 500
      Seq(TypedEvent("click", 400L, 3L))))  // still late vs 500, not 100
    assert(out.drop(1) === Seq(
      LateSummary("click", 1L, 1L, 400L),
      LateSummary("click", 1L, 1L, 100L)))
  }

  test("state is per-type: a hot type never marks another type late") {
    val out = runEpochs("late_types", Seq(
      Seq(TypedEvent("click", 900L, 1L)),
      Seq(TypedEvent("view", 100L, 2L))))
    assert(out.toSet === Set(
      LateSummary("click", 1L, 0L, 0L),
      LateSummary("view", 1L, 0L, 0L)))
  }

  test("multi-epoch replay matches an explicit fold of the block rule") {
    val events = (1L to 40L).map { i =>
      // deterministic zig-zag: event-time advances 50/step but every 7th
      // arrival time-travels back 180
      val ts = i * 50L - (if (i % 7 == 0) 180L else 0L)
      TypedEvent(if (i % 2 == 0) "a" else "b", ts, i)
    }
    val epochs = events.grouped(10).toSeq
    val out = runEpochs("late_fold", epochs)
    // reference fold: per type, per epoch, against prior-epoch running max
    val expected = Seq("a", "b").flatMap { t =>
      var prior = Option.empty[Long]
      epochs.flatMap { e =>
        val mine = e.filter(_.eventType == t)
        if (mine.isEmpty) None else {
          val lates = mine.filter(ev => prior.exists(ev.tsMicros < _))
          val maxLate = lates.map(ev => prior.get - ev.tsMicros)
            .foldLeft(0L)(math.max)
          val s = LateSummary(t, mine.size.toLong, lates.size.toLong, maxLate)
          prior = Some(math.max(prior.getOrElse(Long.MinValue),
            mine.map(_.tsMicros).max))
          Some(s)
        }
      }
    }
    assert(out.groupBy(_.eventType).view.mapValues(_.toSet).toMap ===
      expected.groupBy(_.eventType).view.mapValues(_.toSet).toMap)
  }
}
