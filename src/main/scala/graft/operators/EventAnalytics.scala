package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

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

  // ---- q51_user_growth: DAU / new users / cumulative users per day ------
  // The growth dashboard's base table. Cumulative distinct users is NOT a
  // distinct-count per prefix (quadratic); it's the running sum of
  // first-seen counts — one distinct, two aggs, one tiny window over the
  // day axis (bounded by the calendar, not the data).
  private def q51(s: SparkSession, d: String): DataFrame = {
    val ud = T.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("n_active"))
    val newU = ud.groupBy(col("user_id")).agg(min(col("day")).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("n_new"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    dau.join(newU, Seq("day"), "left")
      .select(col("day"), col("n_active"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
      .withColumn("cum_users", sum(col("n_new")).over(w))
      .orderBy(col("day"))
  }

  private val q51Sql =
    """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
      |  FROM events),
      |dau AS (SELECT day, COUNT(*) AS n_active FROM ud GROUP BY day),
      |firsts AS (SELECT user_id, MIN(day) AS day FROM ud GROUP BY user_id),
      |newu AS (SELECT day, COUNT(*) AS n_new FROM firsts GROUP BY day)
      |SELECT day, n_active, COALESCE(n_new, 0) AS n_new,
      |  CAST(SUM(COALESCE(n_new, 0)) OVER (ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cum_users
      |FROM dau LEFT JOIN newu USING (day)
      |ORDER BY day""".stripMargin

  // ---- q60_rolling_distinct: rolling 7-day active users (WAU) ------------
  // The dashboard metric SQL windows cannot express directly: COUNT
  // (DISTINCT) over a sliding frame (Spark forbids distinct window aggs,
  // and distinct is not additive, so a running sum of daily counts is
  // wrong whenever a user spans days). The scalable exact form: dedupe to
  // (user, day) once, fan each user-day out to the ≤7 report days it
  // contributes to (a ×7 expansion of the DEDUPED metadata-scale rows,
  // never the raw events), and count distinct users per report day.
  // Stickiness = DAU/WAU is one IEEE division of exact BIGINTs.
  private def q60(s: SparkSession, d: String): DataFrame = {
    val ud = T.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val days = ud.select(col("day")).distinct()
      .withColumnRenamed("day", "report_day")
    val wau = ud
      .select(col("user_id"), explode(sequence(lit(0), lit(6))).as("off"),
        col("day"))
      .withColumn("report_day", date_add(col("day"), col("off")))
      // only days the data contains: the grid join, not a calendar guess
      .join(days, Seq("report_day"), "left_semi")
      .groupBy(col("report_day"))
      .agg(countDistinct(col("user_id")).as("wau7"))
    val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
      .withColumnRenamed("day", "report_day")
    dau.join(wau, Seq("report_day"))
      .withColumn("stickiness",
        col("dau").cast(DoubleType) / col("wau7").cast(DoubleType))
      .orderBy(col("report_day"))
  }

  private val q60Sql =
    """WITH ud AS (SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
      |  FROM events),
      |days AS (SELECT DISTINCT day AS report_day FROM ud),
      |contrib AS (
      |  SELECT ud.user_id, ud.day + CAST(o.off AS INTEGER) AS report_day
      |  FROM ud CROSS JOIN (SELECT UNNEST(generate_series(0, 6)) AS off) o),
      |wau AS (
      |  SELECT report_day, COUNT(DISTINCT user_id) AS wau7
      |  FROM contrib SEMI JOIN days USING (report_day)
      |  GROUP BY report_day),
      |dau AS (SELECT day AS report_day, COUNT(*) AS dau FROM ud GROUP BY day)
      |SELECT report_day, dau, wau7,
      |  CAST(dau AS DOUBLE) / CAST(wau7 AS DOUBLE) AS stickiness
      |FROM dau JOIN wau USING (report_day)
      |ORDER BY report_day""".stripMargin

  // ---- events_dedup_window: telemetry burst suppression ------------------
  // Client retries and double-fires produce bursts of the same
  // (user, event_type) within seconds; a clickstream pipeline suppresses
  // repeats closer than a debounce interval to its predecessor. One window
  // pass per (user_id, event_type) — the same shuffle key the rest of the
  // event family reuses; gap arithmetic is integer microseconds, exact in
  // both engines. The first event of a series always survives (null gap).
  private def eventsDedupWindow(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    T.events(s, d)
      .withColumn("gap_us",
        (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
          .cast(LongType))
      .withColumn("is_kept", col("gap_us").isNull || col("gap_us") > 5000000L)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"),
        col("gap_us"), col("is_kept"))
      .orderBy(col("event_id"))
  }

  private val eventsDedupWindowSql =
    """SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
      |  CAST(epoch_us(CAST(ts AS TIMESTAMP)) - lag(epoch_us(CAST(ts AS TIMESTAMP)), 1)
      |    OVER (PARTITION BY user_id, event_type
      |          ORDER BY CAST(ts AS TIMESTAMP), event_id) AS BIGINT) AS gap_us,
      |  COALESCE(epoch_us(CAST(ts AS TIMESTAMP)) - lag(epoch_us(CAST(ts AS TIMESTAMP)), 1)
      |    OVER (PARTITION BY user_id, event_type
      |          ORDER BY CAST(ts AS TIMESTAMP), event_id) > 5000000, TRUE) AS is_kept
      |FROM events ORDER BY event_id""".stripMargin

  // ---- q56_transition_matrix: event-type Markov transitions --------------
  // The sequence-model prep step (and the product-analytics "what do users
  // do next" table): adjacent event pairs within each user's timeline, and
  // the empirical transition probability P(to | from). A lead() window per
  // user — the SAME user_id shuffle key the rest of the family uses, with
  // per-user sorts bounded by per-user event counts — then a tiny
  // (|types|², here ≤ 25-row) aggregation; at 100 TB the wide exchange is
  // the one user_id shuffle, everything after is broadcast-sized.
  // Determinism: ts ties break on event_id; prob is ONE IEEE division of
  // exact BIGINTs (the family rule), so values are bit-identical.
  private def q56(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = T.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .where(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_trans"))
    val fromTotals = pairs.groupBy(col("from_type"))
      .agg(sum(col("n_trans")).cast(LongType).as("n_from"))
    pairs.join(fromTotals, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n_trans"),
        (col("n_trans").cast(org.apache.spark.sql.types.DoubleType) /
          col("n_from").cast(org.apache.spark.sql.types.DoubleType)).as("prob"))
      .orderBy(col("from_type"), col("to_type"))
  }

  private val q56Sql =
    """WITH pairs AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type, 1) OVER (PARTITION BY user_id
      |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS to_type
      |  FROM events),
      |cnt AS (
      |  SELECT from_type, to_type, COUNT(*) AS n_trans
      |  FROM pairs WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
      |tot AS (
      |  SELECT from_type, CAST(SUM(n_trans) AS BIGINT) AS n_from
      |  FROM cnt GROUP BY from_type)
      |SELECT cnt.from_type AS from_type, to_type, n_trans,
      |  CAST(n_trans AS DOUBLE) / CAST(n_from AS DOUBLE) AS prob
      |FROM cnt JOIN tot ON cnt.from_type = tot.from_type
      |ORDER BY from_type, to_type""".stripMargin

  // ---- q57_attribution: last-touch purchase attribution ------------------
  // The marketing-analytics classic: credit each purchase to the LAST
  // non-purchase event preceding it in the user's timeline ('direct' when
  // nothing precedes), then roll up purchases, revenue, and share per
  // channel. The carry-forward is a last(ignoreNulls) over a
  // rows-to-1-PRECEDING frame — the q45 gap-fill machinery pointed at a
  // conditional — so the whole attribution pass is the event family's ONE
  // user_id sort-exchange, no join; the rollup output is |event types|
  // rows and the purchase total joins back as a 1-row broadcast.
  // Determinism: exact counts, exact DECIMAL(12,4) revenue sums (the
  // family's money rule) cast to double at the edge, share = one IEEE
  // division.
  private def q57(s: SparkSession, d: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val back = W.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(W.unboundedPreceding, -1)
    val touched = T.events(s, d)
      .withColumn("channel",
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(back))
      .filter(col("event_type") === "purchase")
      .select(coalesce(col("channel"), lit("direct")).as("channel"),
        col("value"))
    val agg = touched.groupBy(col("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(T.dec(col("value"))).as("vd"))
    val tot = agg.agg(sum(col("n_purchases")).cast(LongType).as("nt"))
    agg.crossJoin(broadcast(tot))
      .select(col("channel"), col("n_purchases"),
        col("vd").cast(org.apache.spark.sql.types.DoubleType)
          .as("total_value"),
        (col("n_purchases").cast(org.apache.spark.sql.types.DoubleType) /
          col("nt").cast(org.apache.spark.sql.types.DoubleType)).as("share"))
      .orderBy(col("channel"))
  }

  private val q57Sql =
    """WITH a AS (
      |  SELECT event_type, value,
      |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
      |        IGNORE NULLS)
      |      OVER (PARTITION BY user_id
      |            ORDER BY CAST(ts AS TIMESTAMP), event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS channel
      |  FROM events),
      |p AS (
      |  SELECT COALESCE(channel, 'direct') AS channel, value
      |  FROM a WHERE event_type = 'purchase'),
      |agg AS (
      |  SELECT channel, COUNT(*) AS n_purchases,
      |    SUM(CAST(value AS DECIMAL(12,4))) AS vd
      |  FROM p GROUP BY channel),
      |tot AS (SELECT CAST(SUM(n_purchases) AS BIGINT) AS nt FROM agg)
      |SELECT channel, n_purchases, CAST(vd AS DOUBLE) AS total_value,
      |  CAST(n_purchases AS DOUBLE) / CAST(nt AS DOUBLE) AS share
      |FROM agg CROSS JOIN tot ORDER BY channel""".stripMargin

  // ---- events_late_report: out-of-order arrival profile ------------------
  // The measurement a watermark delay should be DERIVED from, instead of
  // guessed: how late do events actually arrive? Arrival order is the
  // event_id ingest sequence; an event is late when its ts precedes the
  // max event-time of any EARLIER arrival, and its lateness is that
  // running max minus its own ts — exactly the slack a
  // `withWatermark(delay)` needs to cover to not drop it (the streaming
  // twins' watermark knobs cite this report).
  //
  // Scale shape: deliberately NOT one global running-max window (a
  // single-partition sort — the classic sequential bottleneck). Arrivals
  // collapse into 100-event blocks first; the running max runs over the
  // BLOCK SUMMARY (arrivals/100 rows — tiny at any volume), which then
  // broadcasts back onto the events for an exact prior-block comparison.
  // Within-block disorder is invisible to this estimate, which UNDERSTATES
  // lateness by at most one block span — the fidelity/parallelism knob is
  // the block size, and the watermark consumer rounds up anyway. Rollup to
  // per-type rows: n, late count/share, max and mean lateness.
  private def lateReport(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = T.events(s, d).select(col("event_type"),
      unix_micros(col("ts")).as("tus"),
      expr("event_id div 100").as("block"))
    val wb = Window.orderBy(col("block"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val blocks = ev.groupBy(col("block")).agg(max(col("tus")).as("bmax"))
      .withColumn("prior_max", max(col("bmax")).over(wb))
      .select(col("block"), col("prior_max"))
    ev.join(broadcast(blocks), Seq("block"))
      .withColumn("late_us",
        when(col("prior_max") > col("tus"), col("prior_max") - col("tus"))
          .otherwise(0L))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("late_us") > 0, 1L).otherwise(0L)).cast(LongType)
          .as("n_late"),
        max(col("late_us")).as("max_late_us"),
        sum(col("late_us")).cast(LongType).as("sum_late_us"))
      .select(col("event_type"), col("n_events"), col("n_late"),
        (col("n_late").cast(DoubleType) / col("n_events")).as("late_share"),
        col("max_late_us"),
        when(col("n_late") > 0,
          col("sum_late_us").cast(DoubleType) / col("n_late"))
          .as("avg_late_us"))
      .orderBy(col("event_type"))
  }

  private val lateReportSql =
    """WITH ev AS (SELECT event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
      |    event_id // 100 AS block FROM events),
      |b AS (SELECT block, max(tus) AS bmax FROM ev GROUP BY block),
      |pb AS (SELECT block, max(bmax) OVER (ORDER BY block
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_max
      |  FROM b),
      |l AS (SELECT ev.event_type,
      |    CASE WHEN pb.prior_max > ev.tus THEN pb.prior_max - ev.tus
      |         ELSE 0 END AS late_us
      |  FROM ev JOIN pb USING (block))
      |SELECT event_type, count(*) AS n_events,
      |  CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_late,
      |  CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*) AS late_share,
      |  max(late_us) AS max_late_us,
      |  CASE WHEN sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) > 0
      |    THEN CAST(sum(late_us) AS DOUBLE) /
      |      sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END)
      |    ELSE NULL END AS avg_late_us
      |FROM l GROUP BY event_type ORDER BY event_type""".stripMargin

  override val defs: Seq[(String, QueryDef)] = Seq(
    "events_dedup_window" -> QueryDef(eventsDedupWindow, Some(eventsDedupWindowSql)),
    "events_late_report" -> QueryDef(lateReport, Some(lateReportSql)),
    "q56_transition_matrix" -> QueryDef(q56, Some(q56Sql)),
    "q57_attribution" -> QueryDef(q57, Some(q57Sql)),
    "q49_retention" -> QueryDef(q49, Some(q49Sql)),
    "q50_funnel" -> QueryDef(q50, Some(q50Sql)),
    "q51_user_growth" -> QueryDef(q51, Some(q51Sql)),
    "q60_rolling_distinct" -> QueryDef(q60, Some(q60Sql)))
}
