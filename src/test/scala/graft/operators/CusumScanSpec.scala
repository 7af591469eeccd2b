package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.{Tables => T}

/** metric_cusum's two contracts: (1) the prefix-scan identity
  * S_i = P_i − min(0, min_{j≤i} P_j) really is the textbook recurrence
  * S_i = max(0, S_{i-1} + y_i) — checked against a sequential fold over
  * one full series; (2) the bucket-parallel two-phase scan is
  * bit-identical to the one-partition-per-series window form. */
class CusumScanSpec extends SparkSuite {

  private def events = T.events(spark, sfDir)

  test("bucket-parallel scan is bit-identical to the global window form") {
    val global = MetricBatch.cusumGlobal(events).collect().toSeq
    // an hour per bucket at the fixture's event rate yields many buckets;
    // a tiny bucket (1 min) forces far more offset hand-offs — both match
    val split = MetricBatch.cusumBucketScan(events).collect().toSeq
    val splitTiny = MetricBatch.cusumBucketScan(events, bucketMs = 60000L)
      .collect().toSeq
    assert(global.nonEmpty, "fixture produced no rows — spec is vacuous")
    assert(split === global)
    assert(splitTiny === global)
  }

  test("the identity matches the sequential CUSUM recurrence") {
    import spark.implicits._
    // one series, driver-side: exact BigDecimal fold of the recurrence
    val rows = events.filter(col("event_type") === "click")
      .select(col("ts"), col("event_id"), col("value"))
      .orderBy(col("ts"), col("event_id"))
      .as[(java.sql.Timestamp, Long, Double)].collect()
    assert(rows.length > 100, s"fixture too small: ${rows.length} click rows")
    val n = BigDecimal(rows.length)
    val vs = rows.map(r => BigDecimal(r._3).setScale(4))
    val sv = vs.sum
    val k = BigDecimal("5.0000")
    var s = BigDecimal(0)
    val seq = vs.map { v =>
      s = (s + (n * v - sv - n * k)).max(BigDecimal(0))
      s
    }
    // the engine's top-20 rows for this series must carry exactly the
    // recurrence's statistic at the same (ts, event_id) positions
    val byId = rows.map(_._2).zip(seq).toMap
    val top = MetricBatch.cusumGlobal(events)
      .filter(col("event_type") === "click")
      .select(col("event_id"), col("s").cast("string")).collect()
    assert(top.nonEmpty)
    top.foreach { r =>
      val want = byId(r.getLong(0)).setScale(4)
      assert(BigDecimal(r.getString(1)) == want,
        s"event ${r.getLong(0)}: engine ${r.getString(1)} != fold $want")
    }
  }

  test("the scan shuffle is keyed on (series, bucket), not series alone") {
    val split = MetricBatch.cusumBucketScan(events)
    val plan = split.queryExecution.executedPlan.toString
    assert("hashpartitioning\\(event_type[^)]*bkt".r.findFirstIn(plan).isDefined,
      s"no (event_type, bkt) exchange in plan:\n${plan.take(2000)}")
  }
}
