package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{QueryDef, QueryGroup, Tables => T}

/** Statistical + reshaping operators extending the relational surface:
  * exact-arithmetic moments (variance/stddev/correlation), pivot, exact
  * interpolated percentiles, and deterministic arg-max.
  *
  * Hash-stability notes: Spark's built-in `stddev`/`corr` merge partial
  * moments in partition order — not reproducible across engines — so q33
  * derives the moments from exact decimal power sums cast to double once,
  * with the identical closed-form expression on both sides. arg-max uses
  * lexicographic struct max with a unique tiebreaker column, because both
  * Spark's `max_by` and DuckDB's `arg_max` are nondeterministic under ties.
  */
object Analytics extends QueryGroup {
  import T.dec

  // ---- Q33: exact-arithmetic moments -----------------------------------
  private def q33(s: SparkSession, d: String): DataFrame = {
    val ev = T.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast(LongType))
    val vdec = dec(col("value"))
    val agg = ev.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      sum(vdec).cast(DoubleType).as("sx"),
      sum(vdec * vdec).cast(DoubleType).as("sx2"),
      sum(col("k").cast(DecimalType(18, 0))).cast(DoubleType).as("sy"),
      sum((col("k") * col("k")).cast(DecimalType(18, 0))).cast(DoubleType).as("sy2"),
      sum(vdec * col("k").cast(DecimalType(18, 0))).cast(DoubleType).as("sxy"))
    val n = col("n").cast(DoubleType)
    // n=1 groups and zero-variance series are DEFINED (null), not a
    // divide-by-zero crash — mirrored as CASE in the oracle (EdgeCaseSpec)
    agg.select(
      col("event_type"), col("n"),
      (col("sx") / n).as("mean"),
      when(col("n") > 1,
        (col("sx2") - col("sx") * col("sx") / n) / (n - 1)).as("var_samp"),
      when(col("n") > 1,
        sqrt((col("sx2") - col("sx") * col("sx") / n) / (n - 1)))
        .as("stddev_samp"),
      Stats.pearson(n, col("sx"), col("sx2"), col("sy"), col("sy2"),
        col("sxy")).as("corr_vk"))
      .orderBy(col("event_type"))
  }

  private val q33Sql =
    """WITH a AS (
      |  SELECT event_type, COUNT(*) AS n,
      |    CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(value AS DECIMAL(12,4)) * CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS sx2,
      |    CAST(SUM(CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) AS DECIMAL(18,0))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) * CAST(json_extract_string(props, '$.k') AS BIGINT) AS DECIMAL(18,0))) AS DOUBLE) AS sy2,
      |    CAST(SUM(CAST(value AS DECIMAL(12,4)) * CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) AS DECIMAL(18,0))) AS DOUBLE) AS sxy
      |  FROM events GROUP BY event_type)
      |SELECT event_type, n,
      |  sx / CAST(n AS DOUBLE) AS mean,
      |  CASE WHEN n > 1 THEN
      |    (sx2 - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)
      |  END AS var_samp,
      |  CASE WHEN n > 1 THEN
      |    sqrt((sx2 - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1))
      |  END AS stddev_samp,
      |  CASE WHEN CAST(n AS DOUBLE) * sx2 - sx * sx > 0
      |        AND CAST(n AS DOUBLE) * sy2 - sy * sy > 0 THEN
      |    (CAST(n AS DOUBLE) * sxy - sx * sy) /
      |      (sqrt(CAST(n AS DOUBLE) * sx2 - sx * sx) *
      |       sqrt(CAST(n AS DOUBLE) * sy2 - sy * sy))
      |  END AS corr_vk
      |FROM a ORDER BY event_type""".stripMargin

  // ---- Q34: pivot (conditional aggregation reshaping) -------------------
  private def q34(s: SparkSession, d: String): DataFrame =
    T.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("F"),
        coalesce(col("O"), lit(0L)).as("O"),
        coalesce(col("P"), lit(0L)).as("P"))
      .orderBy(col("o_orderpriority"))

  private val q34Sql =
    """SELECT o_orderpriority,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS F,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS O,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS P
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---- Q62: unpivot (wide → long reshaping, the inverse of Q34) ---------
  /** Melt three lineitem measures into (measure, value) rows with
    * Spark's native unpivot (one narrow generator pass, no join/shuffle
    * before the aggregate), then aggregate per measure. Decimal-exact:
    * all three measures meet in DECIMAL(12,4) — quantity/price carry 2
    * data decimals, discount 4 at most, so the common scale is
    * lossless. Oracle replays as the UNION ALL every engine without a
    * native UNPIVOT uses. */
  private def q62(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d)
      .select(col("l_orderkey"),
        T.dec(col("l_quantity")).as("quantity"),
        T.dec(col("l_extendedprice")).as("extendedprice"),
        T.decr(col("l_discount")).cast(DecimalType(12, 4)).as("discount"))
      .unpivot(Array(col("l_orderkey")),
        Array(col("quantity"), col("extendedprice"), col("discount")),
        "measure", "value")
      .groupBy(col("measure"))
      // q40 precedent: the driver's hasher cannot canonicalize raw
      // DECIMAL columns, and this sum carries ~14 significant digits —
      // beyond double-exact round-trip. Render the exact DECIMAL(18,4)
      // as a canonical STRING on both sides (both print e.g.
      // '152130.9716'); scale-4 sums of ≤4-decimal data are exact.
      .agg(count(lit(1)).as("n"),
        sum(col("value")).cast(DecimalType(18, 4))
          .cast(StringType).as("total"))
      .orderBy(col("measure"))

  private val q62Sql =
    """SELECT measure, COUNT(*) AS n,
      |  CAST(CAST(SUM(v) AS DECIMAL(18,4)) AS VARCHAR) AS total
      |FROM (
      |  SELECT 'quantity' AS measure, CAST(l_quantity AS DECIMAL(12,4)) AS v
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'extendedprice', CAST(l_extendedprice AS DECIMAL(12,4))
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'discount', CAST(l_discount AS DECIMAL(12,4)) FROM lineitem)
      |GROUP BY measure ORDER BY measure""".stripMargin

  // ---- Q35: interpolated percentiles + deterministic arg-max ------------
  private def q35(s: SparkSession, d: String): DataFrame =
    T.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        // rounded through DECIMAL(18,4), output DOUBLE for hasher parity
        expr("percentile(CAST(o_totalprice AS DOUBLE), 0.5)")
          .cast(DecimalType(18, 4)).cast(DoubleType).as("p50"),
        expr("percentile(CAST(o_totalprice AS DOUBLE), 0.9)")
          .cast(DecimalType(18, 4)).cast(DoubleType).as("p90"),
        max(struct(col("o_totalprice").as("p"), col("o_orderkey").as("k")))
          .getField("k").as("top_orderkey"),
        min(struct(col("o_totalprice").as("p"), col("o_orderkey").as("k")))
          .getField("k").as("bottom_orderkey"))
      .orderBy(col("o_orderpriority"))

  private val q35Sql =
    """SELECT o_orderpriority,
      |  CAST(CAST(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5) AS DECIMAL(18,4)) AS DOUBLE) AS p50,
      |  CAST(CAST(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.9) AS DECIMAL(18,4)) AS DOUBLE) AS p90,
      |  (max({'p': o_totalprice, 'k': o_orderkey})).k AS top_orderkey,
      |  (min({'p': o_totalprice, 'k': o_orderkey})).k AS bottom_orderkey
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---- Q40: exact-decimal precision canary ------------------------------
  // Everything else canonicalizes decimal outputs to DOUBLE for the
  // driver's hasher, which caps the oracle's resolution at 53 bits. This
  // one query keeps full precision by rendering the exact DECIMAL(22,2)
  // sum as a canonical STRING on both sides (both print e.g.
  // '506627.00'), so an aggregation bug smaller than 1 ulp of a double
  // still trips the gate. Scale-2 sums of 2-decimal data are exact, and
  // no decimal→double conversion happens at all; the string render is
  // what the driver's hasher (which cannot canonicalize raw DECIMAL
  // columns) compares.
  private def q40(s: SparkSession, d: String): DataFrame =
    T.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        sum(col("o_totalprice").cast(DecimalType(12, 2)))
          .cast(DecimalType(22, 2)).cast(StringType).as("sum_price"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))

  private val q40Sql =
    """SELECT o_orderstatus,
      |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(22,2)) AS VARCHAR) AS sum_price,
      |  COUNT(*) AS n
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---- Q42: event sessionization (session_window, 30 min gap) ----------
  // The classic event-stream reshaping: events within the gap merge into
  // one session; `session_window` plans as one shuffle on user_id with
  // runtime window-merge — no self-join, no driver loop, the shape that
  // scales to 100 TB of clickstream. Oracle replays it with the lag-flag
  // + running-sum sessionization idiom. Boundary semantics (verified
  // empirically on Spark 4.1): an event EXACTLY gap after the previous
  // one still merges, so the oracle's new-session flag must use strict
  // `>` — `>=` would split sessions the engine merges whenever the data
  // contains an exact-gap pair.
  private def q42(s: SparkSession, d: String): DataFrame =
    T.events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))
      .orderBy(col("user_id"), col("session_start"))

  private val q42Sql =
    """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |flag AS (SELECT user_id, ts,
      |  CASE WHEN lag(ts) OVER w IS NULL
      |         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0
      |  END AS ns
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |sess AS (SELECT user_id, ts,
      |  SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM flag)
      |SELECT user_id, MIN(ts) AS session_start,
      |  MAX(ts) + INTERVAL 30 MINUTE AS session_end, COUNT(*) AS n_events
      |FROM sess GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  // ---- Q43: grouping sets + grouping_id (SQL passthrough) ---------------
  // The general form rollup/cube specialize (q12/q13); grouping_id bit
  // semantics match DuckDB's GROUPING(a, b).
  private def q43(s: SparkSession, d: String): DataFrame = {
    T.lineitem(s, d).createOrReplaceTempView("g_q43_lineitem")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping_id() AS BIGINT) AS gid, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty
        |FROM g_q43_lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |                        (l_returnflag), ())
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin)
  }

  private val q43Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
      |                        (l_returnflag), ())
      |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""
      .stripMargin

  // ---- Q44: navigation windows (lag/lead/ntile/percent_rank) ------------
  private def q44(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    T.events(s, d)
      .select(col("event_id"),
        lag(col("value"), 1).over(w).as("lag_v"),
        lead(col("value"), 1).over(w).as("lead_v"),
        ntile(4).over(w).cast(LongType).as("nt"),
        percent_rank().over(w).as("pr"))
      .orderBy(col("event_id"))
  }

  private val q44Sql =
    """SELECT event_id, lag(value) OVER w AS lag_v, lead(value) OVER w AS lead_v,
      |  CAST(ntile(4) OVER w AS BIGINT) AS nt, percent_rank() OVER w AS pr
      |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY event_id""".stripMargin

  // ---- Q45: time-series gap fill + forward fill --------------------------
  // The metrics-domain reshaping: each user's daily series densified over
  // its own active range (sequence + explode — per-row generation, no
  // driver loop), zero-filled counts, and the day's closing value carried
  // forward with last(ignoreNulls) over an ordered window. The closing
  // value uses lexicographic struct max on (ts, event_id, value) — the
  // deterministic arg-max idiom (q35) — since max_by ties are unspecified
  // in both engines.
  private def q45(s: SparkSession, d: String): DataFrame = {
    val daily = T.events(s, d)
      .groupBy(col("user_id"),
        to_date(date_trunc("day", col("ts"))).as("day"))
      .agg(count(lit(1)).as("n"),
        max(struct(col("ts"), col("event_id"), col("value")))
          .getField("value").as("last_v"))
    val cal = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    cal.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n"), lit(0L)).as("n_events"), col("last_v"))
      .withColumn("ffill_v", last(col("last_v"), ignoreNulls = true).over(w))
      .select(col("user_id"), col("day"), col("n_events"), col("ffill_v"))
      .orderBy(col("user_id"), col("day"))
  }

  private val q45Sql =
    """WITH daily AS (
      |  SELECT user_id,
      |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
      |    COUNT(*) AS n,
      |    struct_extract(max({'t': CAST(ts AS TIMESTAMP), 'id': event_id,
      |                        'v': value}), 'v') AS last_v
      |  FROM events GROUP BY 1, 2),
      |spans AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
      |          FROM daily GROUP BY 1),
      |cal AS (SELECT user_id,
      |          unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
      |        FROM spans),
      |joined AS (
      |  SELECT c.user_id, c.day, COALESCE(d.n, 0) AS n_events, d.last_v
      |  FROM cal c LEFT JOIN daily d
      |    ON c.user_id = d.user_id AND c.day = d.day)
      |SELECT user_id, day, CAST(n_events AS BIGINT) AS n_events,
      |  last_value(last_v IGNORE NULLS) OVER (PARTITION BY user_id
      |    ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS ffill_v
      |FROM joined ORDER BY user_id, day""".stripMargin

  // ---- Q46: fixed-width histogram binning --------------------------------
  private def q46(s: SparkSession, d: String): DataFrame =
    T.events(s, d).where(col("value").isNotNull)
      .groupBy(col("event_type"),
        floor(col("value") / 25.0).cast(LongType).as("bin"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"), col("bin"))

  private val q46Sql =
    """SELECT event_type, CAST(floor(value / 25.0) AS BIGINT) AS bin,
      |  COUNT(*) AS n
      |FROM events WHERE value IS NOT NULL
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- Q48: fixed-depth EWMA smoothing ----------------------------------
  // True EWMA is a recursion (each output feeds the next) — not a window
  // function in either engine — so the scalable form truncates the tail:
  // with α=1/2 the weight 4 steps back is 1/16, below most smoothing
  // tolerances. A fixed-depth lag pyramid is one window pass, stays in
  // whole-stage codegen, and (unlike the recursive form) parallelizes
  // per key. Weights are exact binary fractions and the summation order
  // is pinned left-to-right, so IEEE doubles match the oracle bit-wise;
  // (ts, event_id) ordering makes ties deterministic (q44 convention).
  private def q48(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    def l(i: Int) = lag(col("value"), i).over(w)
    val num = col("value") * 8.0 +
      coalesce(l(1) * 4.0, lit(0.0)) +
      coalesce(l(2) * 2.0, lit(0.0)) +
      coalesce(l(3) * 1.0, lit(0.0))
    val den = lit(8.0) +
      when(l(1).isNotNull, 4.0).otherwise(0.0) +
      when(l(2).isNotNull, 2.0).otherwise(0.0) +
      when(l(3).isNotNull, 1.0).otherwise(0.0)
    T.events(s, d)
      .select(col("event_id"), col("user_id"), col("value"),
        (num / den).as("ewma"))
      .orderBy(col("event_id"))
  }

  private val q48Sql =
    """SELECT event_id, user_id, value,
      |  (((value * 8.0
      |     + COALESCE(lag(value, 1) OVER w * 4.0, 0.0))
      |     + COALESCE(lag(value, 2) OVER w * 2.0, 0.0))
      |     + COALESCE(lag(value, 3) OVER w * 1.0, 0.0))
      |  / ((8.0
      |     + CASE WHEN lag(value, 1) OVER w IS NOT NULL THEN 4.0 ELSE 0.0 END
      |     + CASE WHEN lag(value, 2) OVER w IS NOT NULL THEN 2.0 ELSE 0.0 END)
      |     + CASE WHEN lag(value, 3) OVER w IS NOT NULL THEN 1.0 ELSE 0.0 END)
      |  AS ewma
      |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY event_id""".stripMargin

  // ---- q55_session_stats: per-session analytics -------------------------
  // What q42's sessionization is FOR: each (user, session) rolled up to
  // the metrics a product pipeline reads — event count, actual span
  // (first→last event, not the window's +gap tail), distinct event
  // types, exact value sum, and a conversion flag. Built on the
  // PORTABLE lag-flag + running-sum sessionization (the q42 oracle's
  // idiom) rather than session_window, because the session ordinal
  // (`session_seq`) and the true span need the per-row session id.
  //
  // Scale shape: ONE exchange on user_id feeds both window passes (the
  // gap flag and the running session id share the (ts, event_id) sort)
  // and the final per-(user, session) hash aggregation — no join, no
  // self-join, per-key state is one sort run. Gap arithmetic is integer
  // microseconds with the strict-> rule (q42's empirically-verified
  // boundary: an exact-gap pair still merges).
  private def q55(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wc = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    T.events(s, d)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("ns",
        when(lag(col("us"), 1).over(w).isNull ||
          col("us") - lag(col("us"), 1).over(w) > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("ns")).over(wc))
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        (max(col("us")) - min(col("us"))).as("duration_us"),
        countDistinct(col("event_type")).as("n_types"),
        // unscaled-long sum (the q04 move): primitive per-row math, one
        // exact-division edge per session — bit-identical to the
        // decimal-sum cast on the non-negative 2-decimal values
        T.unscaledToDouble(sum(T.unscaled(col("value"), 10000)), 10000)
          .as("value_sum"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("has_purchase"))
      .select(col("user_id"), col("sid").as("session_seq"), col("n_events"),
        col("session_start"), col("session_end"), col("duration_us"),
        col("n_types"), col("value_sum"), col("has_purchase"))
      .orderBy(col("user_id"), col("session_seq"))
  }

  private val q55Sql =
    """WITH e AS (SELECT user_id, event_id, event_type, value,
      |    CAST(ts AS TIMESTAMP) AS ts,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |  FROM events),
      |flag AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL
      |      OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS ns
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (SELECT *, SUM(ns) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM flag)
      |SELECT user_id, CAST(sid AS BIGINT) AS session_seq, COUNT(*) AS n_events,
      |  MIN(ts) AS session_start, MAX(ts) AS session_end,
      |  CAST(MAX(us) - MIN(us) AS BIGINT) AS duration_us,
      |  COUNT(DISTINCT event_type) AS n_types,
      |  CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS value_sum,
      |  CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS has_purchase
      |FROM sess GROUP BY user_id, sid
      |ORDER BY user_id, session_seq""".stripMargin

  // ---- q61_mode: deterministic MODE aggregate ----------------------------
  // The most-frequent-value aggregate the relational surface lacked
  // (Spark has no mode() with a pinned tie-break; DuckDB's mode() ties
  // arbitrarily — both sides therefore compute it the same explicit
  // way: count per (group, value), rank (count DESC, value ASC), keep
  // rank 1). Shape: ONE hash agg over the fact table (map-side
  // combined) collapses to the |groups|×|values| count table, then the
  // rank window and the group total ride one exchange over that
  // VALUE-DOMAIN-bounded relation (6 groups × 7 line numbers here) —
  // never the corpus.
  private def q61(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val counts = T.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"),
        col("l_linenumber").cast(LongType).as("v"))
      .agg(count(lit(1)).as("c"))
    val rank = w.partitionBy(col("l_returnflag"), col("l_linestatus"))
      .orderBy(col("c").desc, col("v"))
    val whole = w.partitionBy(col("l_returnflag"), col("l_linestatus"))
    counts
      .withColumn("rn", row_number().over(rank))
      .withColumn("n_group", sum(col("c")).over(whole).cast(LongType))
      .filter(col("rn") === 1)
      .select(col("l_returnflag"), col("l_linestatus"),
        col("v").as("mode_linenumber"),
        col("c").cast(LongType).as("mode_count"), col("n_group"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  private val q61Sql =
    """WITH c AS (
      |  SELECT l_returnflag, l_linestatus,
      |    CAST(l_linenumber AS BIGINT) AS v, COUNT(*) AS c
      |  FROM lineitem GROUP BY 1, 2, 3),
      |r AS (
      |  SELECT *,
      |    ROW_NUMBER() OVER (PARTITION BY l_returnflag, l_linestatus
      |      ORDER BY c DESC, v) AS rn,
      |    CAST(SUM(c) OVER (PARTITION BY l_returnflag, l_linestatus)
      |      AS BIGINT) AS n_group
      |  FROM c)
      |SELECT l_returnflag, l_linestatus, v AS mode_linenumber,
      |  CAST(c AS BIGINT) AS mode_count, n_group
      |FROM r WHERE rn = 1
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  override val defs: Seq[(String, QueryDef)] = Seq(
    "q61_mode"        -> QueryDef(q61, Some(q61Sql)),
    "q33_stats_exact" -> QueryDef(q33, Some(q33Sql)),
    "q55_session_stats" -> QueryDef(q55, Some(q55Sql)),
    "q34_pivot"       -> QueryDef(q34, Some(q34Sql)),
    "q62_unpivot"     -> QueryDef(q62, Some(q62Sql)),
    "q35_percentile_argmax" -> QueryDef(q35, Some(q35Sql)),
    "q40_decimal_canary" -> QueryDef(q40, Some(q40Sql)),
    "q42_sessionize"  -> QueryDef(q42, Some(q42Sql)),
    "q43_grouping_sets" -> QueryDef(q43, Some(q43Sql)),
    "q44_nav_windows" -> QueryDef(q44, Some(q44Sql)),
    "q45_gap_fill"    -> QueryDef(q45, Some(q45Sql)),
    "q46_histogram"   -> QueryDef(q46, Some(q46Sql)),
    "q48_ewma"        -> QueryDef(q48, Some(q48Sql)),
  )
}
