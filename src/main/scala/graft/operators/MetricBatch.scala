package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{QueryDef, QueryGroup, Tables => T}

/** Q29 — batch replica of the reference's metric→alarm pipeline
  * (SURVEY.md §3.3): the events table plays the metric stream
  * (ts, event_type AS metric, value); a 5-minute tumbling window average
  * (CloudWatch `Statistic: AVERAGE, Period: 300`,
  * /root/reference/config/instance-group-config.json:44-49) is classified
  * against the reference's thresholds — avg ≤ 25 → scale-out, avg > 75 →
  * scale-in (/root/reference/config/instance-group-config.json:47-51,76-80).
  *
  * The streaming twin of this query (windows + watermark +
  * mapGroupsWithState cooldown) lives in graft.streaming and is
  * golden-tested rather than oracle-checked.
  */
object MetricBatch extends QueryGroup {
  import T.dec

  private def q29(s: SparkSession, d: String): DataFrame =
    T.events(s, d)
      .groupBy(window(col("ts"), "5 minutes").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n_obs"),
        (sum(dec(col("value"))).cast(DoubleType) / count(lit(1))).as("avg_value"))
      .select(
        col("win.start").as("win_start"),
        col("event_type"),
        col("n_obs"),
        col("avg_value"),
        when(col("avg_value") <= 25, "scale-out")
          .when(col("avg_value") > 75, "scale-in")
          .otherwise("hold").as("decision"))
      .orderBy(col("win_start"), col("event_type"))

  private val q29Sql =
    """SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) AS win_start,
      |  event_type, COUNT(*) AS n_obs,
      |  CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*) AS avg_value,
      |  CASE WHEN CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*) <= 25
      |         THEN 'scale-out'
      |       WHEN CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*) > 75
      |         THEN 'scale-in'
      |       ELSE 'hold' END AS decision
      |FROM events GROUP BY win_start, event_type
      |ORDER BY win_start, event_type""".stripMargin

  // ---- Q29b: SLIDING window average (the alarm's literal R14 shape:
  // Period 300 s re-evaluated on the 150 s half-cadence). Each observation
  // lands in ceil(window/slide)=2 windows; DuckDB emulates the assignment
  // with an explicit 2-way expansion over epoch-ms arithmetic.
  private def q29b(s: SparkSession, d: String): DataFrame =
    T.events(s, d)
      .groupBy(window(col("ts"), "5 minutes", "150 seconds").as("win"),
        col("event_type"))
      .agg(count(lit(1)).as("n_obs"),
        (sum(dec(col("value"))).cast(DoubleType) / count(lit(1))).as("avg_value"))
      .select(col("win.start").as("win_start"), col("event_type"),
        col("n_obs"), col("avg_value"))
      .orderBy(col("win_start"), col("event_type"))

  private val q29bSql =
    """WITH x AS (
      |  SELECT event_type, CAST(value AS DECIMAL(12,4)) AS v,
      |    (epoch_ms(CAST(ts AS TIMESTAMP))//150000 - k) * 150000 AS wsms,
      |    epoch_ms(CAST(ts AS TIMESTAMP)) AS ems
      |  FROM events CROSS JOIN (SELECT unnest(range(2)) AS k))
      |SELECT CAST(to_timestamp(wsms/1000.0) AS TIMESTAMP) AS win_start,
      |  event_type, COUNT(*) AS n_obs,
      |  CAST(SUM(v) AS DOUBLE) / COUNT(*) AS avg_value
      |FROM x WHERE ems - wsms < 300000
      |GROUP BY win_start, event_type
      |ORDER BY win_start, event_type""".stripMargin

  override val defs: Seq[(String, QueryDef)] = Seq(
    "q29_metric_window" -> QueryDef(q29, Some(q29Sql)),
    "q29b_sliding_window" -> QueryDef(q29b, Some(q29bSql)),
  )
}
