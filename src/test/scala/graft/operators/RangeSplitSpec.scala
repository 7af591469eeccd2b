package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.{Tables => T}

/** The metric_anomaly parallelism contract: the (series, segment)
  * range-split form is bit-identical to the textbook one-partition-per-
  * series window, while its shuffle keys carry the segment — so a
  * 3-series/100 TB stream parallelizes by data volume, not series count. */
class RangeSplitSpec extends SparkSuite {

  private def events = T.events(spark, sfDir)

  test("range-split rows are bit-identical to the global-window form") {
    val global = MetricBatch.anomalyGlobal(events).collect().toSeq
    // segRows far below the fixture's per-series row count so MANY
    // segments (and several context hand-offs) are actually exercised
    val split = MetricBatch.anomalyRangeSplit(events, segRows = 40)
      .collect().toSeq
    assert(global.nonEmpty, "fixture produced no anomalies — spec is vacuous")
    assert(split === global)
  }

  test("default parameters match too (the registry path)") {
    val global = MetricBatch.anomalyGlobal(events).collect().toSeq
    val split = MetricBatch.anomalyRangeSplit(events).collect().toSeq
    assert(split === global)
  }

  test("the window shuffle is keyed on (series, segment), not series alone") {
    val split = MetricBatch.anomalyRangeSplit(events, segRows = 40)
    val plan = split.queryExecution.executedPlan.toString
    // the trailing-20 window's exchange must carry the segment key —
    // partitioning on event_type alone is the ceiling this shape removes
    assert(plan.contains("hashpartitioning(event_type"), plan.take(2000))
    assert("hashpartitioning\\(event_type[^)]*seg".r.findFirstIn(plan).isDefined,
      s"no (event_type, seg) exchange in plan:\n${plan.take(2000)}")
    // and the split genuinely fans out: more (series, segment) groups
    // than series
    val nSeries = events.select("event_type").distinct().count()
    val segCount = events
      .groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
      .select(sum(expr("(cnt + 39) div 40")).as("segs"))
      .collect().head.getLong(0)
    assert(segCount > nSeries,
      s"fixture too small: $segCount segments over $nSeries series")
  }
}
