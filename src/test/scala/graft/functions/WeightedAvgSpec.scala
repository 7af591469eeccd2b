package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** UDAF surface (SURVEY.md capability matrix): the Aggregator runs as a
  * proper partial/final aggregate and matches the closed form. */
class WeightedAvgSpec extends SparkSuite {
  import WeightedAvg.weighted_avg
  import spark.implicits._

  test("matches sum(v*w)/sum(w) on a grouped aggregation") {
    val df = Seq(
      ("a", 1.0, 1.0), ("a", 3.0, 3.0), ("b", 10.0, 2.0), ("b", 20.0, 0.0)
    ).toDF("k", "v", "w").repartition(4) // force partial/merge paths
    val got = df.groupBy("k").agg(weighted_avg(col("v"), col("w")).as("wa"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("a") == (1.0 * 1 + 3.0 * 3) / 4.0)
    assert(got("b") == 10.0)
  }

  test("zero total weight yields NaN, not a crash") {
    val df = Seq(("a", 5.0, 0.0)).toDF("k", "v", "w")
    val r = df.groupBy("k").agg(weighted_avg(col("v"), col("w"))).collect()(0)
    assert(r.getDouble(1).isNaN)
  }

  test("SQL registration works") {
    WeightedAvg.register(spark)
    Seq((2.0, 1.0), (4.0, 3.0)).toDF("v", "w").createOrReplaceTempView("wa_t")
    val r = spark.sql("SELECT weighted_avg(v, w) FROM wa_t").collect()(0).getDouble(0)
    assert(r == (2.0 + 12.0) / 4.0)
  }
}
