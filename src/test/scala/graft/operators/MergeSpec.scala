package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite}

/** CDC apply semantics + the broadcast-anti plan shape that keeps the
  * base side shuffle-free. */
class MergeSpec extends SparkSuite {
  import spark.implicits._

  test("upsert replaces, insert lands, delete drops") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq((2L, "B", "U"), (4L, "d", "I"), (3L, "c", "D"))
      .toDF("k", "v", "op")
    val out = Merge.applyChanges(base, changes, "k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(out == Set((1L, "a", "base"), (2L, "B", "upsert"),
      (4L, "d", "upsert")))
  }

  test("empty change set returns the base unchanged") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val changes = Seq.empty[(Long, String, String)].toDF("k", "v", "op")
    val out = Merge.applyChanges(base, changes, "k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(out == Set((1L, "a", "base"), (2L, "b", "base")))
  }

  test("delete of a missing key is a no-op; upsert same key twice keeps both change rows distinct keys only") {
    val base = Seq((1L, "a")).toDF("k", "v")
    val changes = Seq((9L, "x", "D"), (2L, "b", "I")).toDF("k", "v", "op")
    val out = Merge.applyChanges(base, changes, "k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "a"), (2L, "b")))
  }

  test("base side is anti-joined via broadcast (no base shuffle)") {
    val df = SparkEntry.queries("q47_merge_upsert")(spark, sfDir)
    df.collect() // materialize so AQE settles the final plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftAnti"), plan.take(2000))
  }

  test("merged row count = base - deletes + inserts") {
    val n = graft.core.Tables.orders(spark, sfDir).count()
    val del = graft.core.Tables.orders(spark, sfDir)
      .filter(col("o_orderkey") % 17 === 0).count()
    val ins = graft.core.Tables.orders(spark, sfDir)
      .filter(col("o_orderkey") % 100 === 0).count()
    val merged = SparkEntry.queries("q47_merge_upsert")(spark, sfDir).count()
    assert(merged == n - del + ins)
  }
}
