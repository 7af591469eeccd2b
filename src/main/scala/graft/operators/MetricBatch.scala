package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

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

  // ---- Sliding z-score anomaly detection --------------------------------
  // The reference's alarm is a FIXED threshold on a window average
  // (config/instance-group-config.json:47-51); the natural next step a
  // metrics user asks for is a SELF-CALIBRATING threshold: flag an
  // observation whose z-score against the trailing 20 observations of its
  // own series exceeds 2.5. One window pass per series — partitioned by
  // event_type, so 100 TB of metrics parallelize across series; the frame
  // is ROWS-bounded (constant state per row, never a growing range).
  //
  // Determinism: mean/variance come from exact DECIMAL power sums (the q33
  // trick — sum(v) and sum(v*v) are exact, order-independent), and every
  // IEEE step after the casts (divide, multiply, subtract, sqrt — sqrt is
  // correctly-rounded by IEEE-754) is written in the same order in both
  // engines, so z is bit-identical and the |z| > 2.5 cut can't flip.
  private def anomaly(s: SparkSession, d: String): DataFrame = {
    val v = dec(col("value"))
    val win = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-20, -1)
    val base = T.events(s, d)
      .select(col("event_type"), col("ts"), col("event_id"), col("value"), v.as("v"))
      .withColumn("n", count(lit(1)).over(win))
      .withColumn("s1", sum(col("v")).over(win).cast(DoubleType))
      .withColumn("s2", sum(col("v") * col("v")).over(win).cast(DoubleType))
      .filter(col("n") >= 10)
      .withColumn("mean", col("s1") / col("n"))
      .withColumn("variance",
        greatest(col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n")),
          lit(0.0)))
    base.filter(col("variance") > 0)
      .withColumn("z",
        (col("v").cast(DoubleType) - col("mean")) / sqrt(col("variance")))
      .filter(abs(col("z")) > 2.5)
      .select(col("event_type"), col("ts"), col("event_id"), col("value"),
        col("n"), col("mean"), col("z"))
      .orderBy(col("event_type"), col("ts"), col("event_id"))
  }

  private val anomalySql =
    """WITH e AS (
      |  SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, event_id, value,
      |    CAST(value AS DECIMAL(12,4)) AS v
      |  FROM events),
      |w AS (
      |  SELECT event_type, ts, event_id, value, v,
      |    COUNT(*) OVER win AS n,
      |    CAST(SUM(v) OVER win AS DOUBLE) AS s1,
      |    CAST(SUM(v*v) OVER win AS DOUBLE) AS s2
      |  FROM e WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id
      |    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
      |z AS (
      |  SELECT event_type, ts, event_id, value, n, s1/n AS mean,
      |    (CAST(v AS DOUBLE) - s1/n) /
      |      sqrt(greatest(s2/n - (s1/n)*(s1/n), 0)) AS z,
      |    greatest(s2/n - (s1/n)*(s1/n), 0) AS variance
      |  FROM w WHERE n >= 10)
      |SELECT event_type, ts, event_id, value, n, mean, z
      |FROM z WHERE variance > 0 AND abs(z) > 2.5
      |ORDER BY event_type, ts, event_id""".stripMargin

  override val defs: Seq[(String, QueryDef)] = Seq(
    "q29_metric_window" -> QueryDef(q29, Some(q29Sql)),
    "q29b_sliding_window" -> QueryDef(q29b, Some(q29bSql)),
    "metric_anomaly" -> QueryDef(anomaly, Some(anomalySql)),
  )
}
