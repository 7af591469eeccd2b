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
  // own series exceeds 2.5. The frame is ROWS-bounded (constant state per
  // row, never a growing range).
  //
  // Determinism: mean/variance come from exact DECIMAL power sums (the q33
  // trick — sum(v) and sum(v*v) are exact, order-independent), and every
  // IEEE step after the casts (divide, multiply, subtract, sqrt — sqrt is
  // correctly-rounded by IEEE-754) is written in the same order in both
  // engines, so z is bit-identical and the |z| > 2.5 cut can't flip.

  /** z-score/filter/projection tail shared by [[anomalyGlobal]] and
    * [[anomalyRangeSplit]] — input carries (event_type, ts, event_id,
    * value, v, n, s1, s2). */
  private def zTail(base: DataFrame): DataFrame =
    base.filter(col("n") >= 10)
      .withColumn("mean", col("s1") / col("n"))
      .withColumn("variance",
        greatest(col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n")),
          lit(0.0)))
      .filter(col("variance") > 0)
      .withColumn("z",
        (col("v").cast(DoubleType) - col("mean")) / sqrt(col("variance")))
      .filter(abs(col("z")) > 2.5)
      .select(col("event_type"), col("ts"), col("event_id"), col("value"),
        col("n"), col("mean"), col("z"))
      .orderBy(col("event_type"), col("ts"), col("event_id"))

  /** The textbook single-window form: one partition per series. Kept as
    * the semantic reference (RangeSplitSpec diffs the split path against
    * it); its parallelism ceiling — a 3-series/100 TB stream uses 3
    * tasks — is why the registry runs [[anomalyRangeSplit]] instead. */
  private[operators] def anomalyGlobal(events: DataFrame): DataFrame = {
    val win = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-20, -1)
    zTail(events
      .select(col("event_type"), col("ts"), col("event_id"), col("value"),
        dec(col("value")).as("v"))
      .withColumn("n", count(lit(1)).over(win))
      .withColumn("s1", sum(col("v")).over(win).cast(DoubleType))
      .withColumn("s2", sum(col("v") * col("v")).over(win).cast(DoubleType)))
  }

  /** (series, segment) range-split of the same computation, so
    * parallelism scales with data volume instead of series count.
    *
    * Shape: a two-phase distributed prefix sum (the pack_sequences move)
    * assigns every row its exact global index `g` within its series —
    * position within a (series, time-bucket) partition from one bucketed
    * window, plus the bucket's cumulative offset from a metadata-scale
    * summary (series × buckets rows, AQE-broadcast) — then rows are
    * grouped into fixed `segRows`-row segments, the last 20 rows of each
    * segment are DUPLICATED into the next as frame context, and the
    * trailing-20 window runs per (series, segment). Every segment except
    * a series' last holds exactly `segRows` core rows ≥ 21, so the 20
    * context rows always cover a core row's global frame: the window
    * sees precisely the rows `g-20 … g-1`, and the exact-decimal power
    * sums make the per-segment results bit-identical to the global form.
    * Tasks scale as Σ ceil(series_rows / segRows), not |series|. */
  private[operators] def anomalyRangeSplit(events: DataFrame,
      bucketMs: Long = 3600000L, segRows: Int = 1000): DataFrame = {
    require(segRows >= 21,
      s"anomaly range-split: segRows=$segRows cannot cover the 20-row frame")
    val rows = events
      .select(col("event_type"), col("ts"), col("event_id"), col("value"),
        dec(col("value")).as("v"))
      .withColumn("bkt", expr(s"unix_millis(ts) div ${bucketMs}L"))
    // phase 1: position within (series, bucket) — parallel by bucket
    val wB = Window.partitionBy(col("event_type"), col("bkt"))
      .orderBy(col("ts"), col("event_id"))
    val posed = rows.withColumn("pos", row_number().over(wB))
    // phase 2: bucket offsets from the metadata-scale summary; the window
    // here runs per series but over series×buckets ROWS, not the data
    val offs = rows.groupBy(col("event_type"), col("bkt"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(sum(col("cnt")).over(
        Window.partitionBy(col("event_type")).orderBy(col("bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("event_type"), col("bkt"), col("off"))
    val g = posed.join(offs, Seq("event_type", "bkt"))
      .withColumn("g", col("off") + col("pos"))
      .withColumn("seg", expr(s"(g - 1) div ${segRows}L"))
      .drop("bkt", "pos", "off")
    val core = g.withColumn("ctx", lit(false))
    // frame-overlap duplication: a segment's last 20 rows also feed the
    // NEXT segment's window partition (context-only — filtered before zTail)
    val ctx = g.filter(col("g") - col("seg") * segRows > segRows - 20)
      .withColumn("seg", col("seg") + 1)
      .withColumn("ctx", lit(true))
    val wS = Window.partitionBy(col("event_type"), col("seg"))
      .orderBy(col("g")).rowsBetween(-20, -1)
    zTail(core.unionByName(ctx)
      .withColumn("n", count(lit(1)).over(wS))
      .withColumn("s1", sum(col("v")).over(wS).cast(DoubleType))
      .withColumn("s2", sum(col("v") * col("v")).over(wS).cast(DoubleType))
      .filter(!col("ctx")))
  }

  private def anomaly(s: SparkSession, d: String): DataFrame =
    anomalyRangeSplit(T.events(s, d))

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
