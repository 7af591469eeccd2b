package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite}

/** Structural invariants for the event-analytics pair. */
class EventAnalyticsSpec extends SparkSuite {

  test("funnel counts are monotone non-increasing down the steps") {
    val rows = SparkEntry.queries("q50_funnel")(spark, sfDir).collect()
    assert(rows.length == 3)
    val counts = rows.sortBy(_.getAs[Long]("step")).map(_.getAs[Long]("n_users"))
    assert(counts(0) >= counts(1) && counts(1) >= counts(2), counts.toSeq)
    assert(counts(0) > 0)
  }

  test("user growth: cumulative count ends at total distinct users") {
    val rows = SparkEntry.queries("q51_user_growth")(spark, sfDir)
      .orderBy(col("day")).collect()
    val total = graft.core.Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(rows.last.getAs[Long]("cum_users") == total)
    assert(rows.map(_.getAs[Long]("n_new")).sum == total)
    // n_active never exceeds the cumulative registered population
    assert(rows.forall(r =>
      r.getAs[Long]("n_active") <= r.getAs[Long]("cum_users")))
  }

  test("retention week 0 equals each cohort's size; users count once per cell") {
    val ret = SparkEntry.queries("q49_retention")(spark, sfDir).collect()
    val week0 = ret.filter(_.getAs[Long]("weeks_since") == 0L)
      .map(r => r.getAs[java.sql.Date]("cohort_week") -> r.getAs[Long]("n_users"))
      .toMap
    val cohorts = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"),
        to_date(date_trunc("week", col("ts"))).as("week"))
      .groupBy(col("user_id")).agg(min(col("week")).as("cw"))
      .groupBy(col("cw")).agg(count(lit(1)).as("n"))
      .collect()
      .map(r => r.getAs[java.sql.Date]("cw") -> r.getAs[Long]("n")).toMap
    assert(week0 == cohorts)
    // a later-week cell can never exceed its cohort's size
    assert(ret.forall(r => r.getAs[Long]("n_users") <=
      cohorts(r.getAs[java.sql.Date]("cohort_week"))))
  }
}
