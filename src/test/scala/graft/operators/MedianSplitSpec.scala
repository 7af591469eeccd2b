package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.{Tables => T}

/** The metric_moving_median parallelism contract: the CENTERED-frame
  * (series, segment) range-split — context rows duplicated BOTH ways —
  * is bit-identical to the textbook one-partition-per-series ±10 window,
  * and metric_trend's closed-form OLS recovers an exactly-linear series. */
class MedianSplitSpec extends SparkSuite {

  private def events = T.events(spark, sfDir)

  test("median range-split rows are bit-identical to the global form") {
    val global = MetricBatch.movingMedianGlobal(events).collect().toSeq
    // segRows far below the fixture's per-series row count so many
    // segments — and both context directions — are actually exercised
    val split = MetricBatch.movingMedianRangeSplit(events, segRows = 40)
      .collect().toSeq
    assert(global.nonEmpty, "fixture produced no rows — spec is vacuous")
    assert(split === global)
  }

  test("default parameters match too (the registry path)") {
    val global = MetricBatch.movingMedianGlobal(events).collect().toSeq
    val split = MetricBatch.movingMedianRangeSplit(events).collect().toSeq
    assert(split === global)
  }

  test("the window shuffle is keyed on (series, segment), not series alone") {
    val split = MetricBatch.movingMedianRangeSplit(events, segRows = 40)
    val plan = split.queryExecution.executedPlan.toString
    assert("hashpartitioning\\(event_type[^)]*seg".r.findFirstIn(plan).isDefined,
      s"no (event_type, seg) exchange in plan:\n${plan.take(2000)}")
  }

  test("trend recovers an exact linear series and nulls degenerate ones") {
    import spark.implicits._
    val base = 1700000000000L // ms epoch, whole seconds
    val lin = (0 until 50).map(i =>
      ("lin", new Timestamp(base + i * 1000L), s"e$i", 5.0 + 2.0 * i))
    val flat = (0 until 10).map(i =>
      ("flat", new Timestamp(base + i * 1000L), s"f$i", 7.0))
    val single = Seq(("one", new Timestamp(base), "s0", 3.0))
    val ev = (lin ++ flat ++ single)
      .toDF("event_type", "ts", "event_id", "value")
    val got = MetricBatch.trendOf(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    val l = got("lin")
    assert(math.abs(l.getDouble(2) - 2.0) < 1e-9, s"slope ${l.getDouble(2)}")
    assert(math.abs(l.getDouble(3) - 5.0) < 1e-9, s"intercept ${l.getDouble(3)}")
    assert(math.abs(l.getDouble(4) - 1.0) < 1e-12, s"r2 ${l.getDouble(4)}")
    // zero value-variance: slope/intercept defined (0, 7), r² null
    val f = got("flat")
    assert(f.getDouble(2) == 0.0 && f.getDouble(3) == 7.0 && f.isNullAt(4))
    // single point: zero time-variance → all three null, never a NaN
    val s1 = got("one")
    assert(s1.isNullAt(2) && s1.isNullAt(3) && s1.isNullAt(4))
  }
}
