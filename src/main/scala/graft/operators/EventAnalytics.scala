package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.core.{QueryDef, QueryGroup, Tables => T}

/** Product-analytics operators over the event stream: weekly cohort
  * retention and an ordered conversion funnel — the two queries every
  * clickstream warehouse runs daily.
  *
  * Scale shape: retention is two hash aggregations and one co-partitioned
  * join, all keyed on user_id; the funnel is a chain of filtered
  * min-aggregations joined on user_id — after the first shuffle every
  * later stage reuses the same hash partitioning, so a 100 TB event log
  * costs one wide exchange. Week arithmetic is integer day-diffs
  * (truncating `div`), portable to the oracle.
  */
object EventAnalytics extends QueryGroup {

  // ---- q49_retention: weekly cohort retention ---------------------------
  private def q49(s: SparkSession, d: String): DataFrame = {
    val uw = T.events(s, d)
      .select(col("user_id"),
        to_date(date_trunc("week", col("ts"))).as("week"))
      .distinct()
    val cohort = uw.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    uw.join(cohort, Seq("user_id"))
      .select(col("cohort_week"),
        expr("datediff(week, cohort_week) div 7").cast(LongType)
          .as("weeks_since"))
      .groupBy(col("cohort_week"), col("weeks_since"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_week"), col("weeks_since"))
  }

  private val q49Sql =
    """WITH uw AS (SELECT DISTINCT user_id,
      |    CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS week
      |  FROM events),
      |cohort AS (SELECT user_id, MIN(week) AS cohort_week
      |  FROM uw GROUP BY user_id)
      |SELECT cohort_week,
      |  CAST(datediff('day', cohort_week, week) // 7 AS BIGINT) AS weeks_since,
      |  COUNT(*) AS n_users
      |FROM uw JOIN cohort USING (user_id)
      |GROUP BY cohort_week, weeks_since
      |ORDER BY cohort_week, weeks_since""".stripMargin

  // ---- q50_funnel: ordered view → click → purchase conversion -----------
  // Each step's timestamp must come strictly AFTER the previous step's —
  // the ordered-sequence semantics that distinguishes a funnel from three
  // independent existence checks.
  private def q50(s: SparkSession, d: String): DataFrame = {
    val ev = T.events(s, d).select(col("user_id"), col("ts"), col("event_type"))
    val t1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val t2 = ev.filter(col("event_type") === "click")
      .join(t1, Seq("user_id")).filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val t3 = ev.filter(col("event_type") === "purchase")
      .join(t2, Seq("user_id")).filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    t1.agg(count(lit(1)).as("n_users")).select(lit(1L).as("step"),
        lit("view").as("step_name"), col("n_users"))
      .unionByName(t2.agg(count(lit(1)).as("n_users"))
        .select(lit(2L).as("step"), lit("view>click").as("step_name"),
          col("n_users")))
      .unionByName(t3.agg(count(lit(1)).as("n_users"))
        .select(lit(3L).as("step"), lit("view>click>purchase").as("step_name"),
          col("n_users")))
      .orderBy(col("step"))
  }

  private val q50Sql =
    """WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
      |  FROM events),
      |t1 AS (SELECT user_id, MIN(ts) AS t1 FROM ev
      |  WHERE event_type = 'view' GROUP BY user_id),
      |t2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM ev e
      |  JOIN t1 ON e.user_id = t1.user_id
      |  WHERE e.event_type = 'click' AND e.ts > t1.t1 GROUP BY e.user_id),
      |t3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM ev e
      |  JOIN t2 ON e.user_id = t2.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > t2.t2 GROUP BY e.user_id)
      |SELECT step, step_name, n_users FROM (
      |  SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name,
      |    COUNT(*) AS n_users FROM t1
      |  UNION ALL SELECT 2, 'view>click', COUNT(*) FROM t2
      |  UNION ALL SELECT 3, 'view>click>purchase', COUNT(*) FROM t3)
      |ORDER BY step""".stripMargin

  override val defs: Seq[(String, QueryDef)] = Seq(
    "q49_retention" -> QueryDef(q49, Some(q49Sql)),
    "q50_funnel" -> QueryDef(q50, Some(q50Sql)))
}
