package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{QueryDef, QueryGroup, Tables => T}
import graft.functions.GraftFunctions.bc_div

/** Breadth extras: outer generators (null-preserving explode/inline) and a
  * schema-declared JSON line source running the bc_div expression under the
  * oracle. */
object Extras extends QueryGroup {

  // ---- Q36: outer generators over possibly-empty arrays -----------------
  private def q36(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .select(col("doc_id"),
        filter(split(col("text"), " "), w => length(w) >= 6).as("lw"))
      .select(col("doc_id"),
        inline_outer(transform(col("lw"),
          w => struct(w.as("word"), length(w).cast(LongType).as("wlen")))))
      .orderBy(col("doc_id"), col("word").asc_nulls_first)

  private val q36Sql =
    """SELECT doc_id, u.word AS word, u.wlen AS wlen FROM (
      |  SELECT doc_id, unnest(
      |    -- l IS NULL (null text) must ALSO emit the one null row:
      |    -- Spark's inline_outer(null) does, while unnest(NULL) would
      |    -- emit zero rows and silently desync on a null-text document
      |    CASE WHEN l IS NULL OR len(l) = 0
      |         THEN [{'word': CAST(NULL AS VARCHAR), 'wlen': CAST(NULL AS BIGINT)}]
      |         ELSE list_transform(l, w -> {'word': w, 'wlen': CAST(length(w) AS BIGINT)})
      |    END) AS u
      |  FROM (SELECT doc_id,
      |          list_filter(string_split(text, ' '), w -> length(w) >= 6) AS l
      |        FROM documents))
      |ORDER BY doc_id, word NULLS FIRST""".stripMargin

  // ---- Q37: declared-schema JSON source + bc_div under the oracle -------
  private[operators] object MetricsJsonl {
    val path: String = graft.core.Fixtures.path("metrics.jsonl")
    def ensure(): String = synchronized {
      val p = Paths.get(path)
      Files.createDirectories(p.getParent)
      val lines = (0 until 200).map { i =>
        val total = if (i % 17 == 0) 0 else 16 // zero-divisor ticks included
        s"""{"ts": ${1700000000L + i * 30}, "avail": ${i % 17}, "total": $total}"""
      }
      Files.writeString(p, lines.mkString("\n") + "\n")
      path
    }
  }

  private def q37(s: SparkSession, d: String): DataFrame = {
    val path = MetricsJsonl.ensure()
    s.read.schema("ts LONG, avail LONG, total LONG").json(path)
      .select(col("ts"),
        bc_div(col("avail") * 100, col("total"), 2).as("pct"))
      .orderBy(col("ts"))
  }

  private val q37Sql =
    s"""SELECT ts,
       |  CASE WHEN total = 0 THEN NULL
       |       ELSE floor(CAST(avail * 100 AS DOUBLE) * 100.0 / CAST(total AS DOUBLE)) / 100.0
       |  END AS pct
       |FROM read_json('${MetricsJsonl.path}', format='newline_delimited',
       |  columns={'ts': 'BIGINT', 'avail': 'BIGINT', 'total': 'BIGINT'})
       |ORDER BY ts""".stripMargin

  // ---- Q38: as-of join (most recent prior observation) ------------------
  // The merge-ordered composition of an as-of join: for every event, the
  // value of the latest 'error' event at-or-before it for the same user —
  // one window pass over (user, ts) instead of a per-row backward probe.
  // Scales as a single shuffle on user_id + sort, the standard distributed
  // as-of shape.
  private def q38(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    T.events(s, d)
      .withColumn("last_error_value",
        last(when(col("event_type") === "error", col("value")),
          ignoreNulls = true).over(w))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("event_type"), col("last_error_value"))
      .orderBy(col("event_id"))
  }

  private val q38Sql =
    """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
      |  last_value(CASE WHEN event_type = 'error' THEN value END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_error_value
      |FROM events ORDER BY event_id""".stripMargin

  // ---- Q53: forward as-of (next matching value at-or-after) -------------
  // The direction='forward' counterpart of q38's backward as-of: each
  // event picks up the NEXT purchase's value in its stream — the lookup
  // shape behind label joins ("what did the user buy after seeing
  // this?"). Same one-window plan, frame reversed; no self-join.
  private def q53(s: SparkSession, d: String): DataFrame = {
    // DESCENDING running frame, not first() over [CURRENT, UNBOUNDED
    // FOLLOWING]: Spark's unbounded-following frame re-scans from the
    // current row to the partition end for EVERY row — O(n²) per user,
    // and the 10× sweep measured it superlinear (10.5× at 10× rows).
    // last() over the reversed running frame is the same value with the
    // incremental O(n) frame; the second sort shares the exchange.
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    T.events(s, d)
      .withColumn("next_purchase_value",
        last(when(col("event_type") === "purchase", col("value")),
          ignoreNulls = true).over(w))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("event_type"), col("next_purchase_value"))
      .orderBy(col("event_id"))
  }

  private val q53Sql =
    """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
      |  first_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      |    AS next_purchase_value
      |FROM events ORDER BY event_id""".stripMargin

  // ---- Q39: skewed fact⋈dim join via explicit salting -------------------
  // The hot-key guard from SURVEY §4.2: events concentrate on few user_ids
  // (the fixture's activity distribution is uneven), so a shuffle join on
  // user_id puts a hot user's rows in one task. `Salting.saltedJoin` turns
  // the key into (user_id, salt∈[0,8)): the fact side salts, the dim side
  // replicates 8×, the hot key's rows spread over 8 tasks. The salt is
  // internal — the aggregate result is identical to the plain join, which
  // is exactly what the oracle replays (plan shape asserted in PlanSpec).
  private def q39(s: SparkSession, d: String): DataFrame = {
    val ev = T.events(s, d).select(col("user_id"), col("value"))
    val cust = T.customer(s, d)
      .select(col("c_custkey").as("user_id"), col("c_nationkey"))
    Salting.saltedJoin(ev, cust, Seq("user_id"), n = 8)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_events"),
        sum(T.dec(col("value"))).cast(DoubleType).as("sum_value"))
      .orderBy(col("c_nationkey"))
  }

  private val q39Sql =
    """SELECT c_nationkey, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS sum_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  // ---- Q41: as-of join on the native custom operator --------------------
  // Same family as q38, but through the engine's whole-operator path:
  // AsOfJoinPlan → AsOfJoinStrategy → AsOfJoinExec (plans/AsOfJoin.scala),
  // the (c)-tier of SURVEY §7.3. Probes are all events; quotes are the
  // 'error' events pre-aggregated per (user_id, ts) with max_by(event_id)
  // so right-side ties are deterministic — the same uniqueness contract
  // DuckDB's ASOF JOIN needs, which is exactly what the oracle runs.
  private def q41(s: SparkSession, d: String): DataFrame = {
    val probes = T.events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val errs = T.events(s, d).where(col("event_type") === "error")
      .groupBy(col("user_id"), col("ts"))
      .agg(max_by(col("value"), col("event_id")).as("err_value"))
      .select(col("user_id").as("r_user"), col("ts").as("r_ts"),
        col("err_value"))
    graft.plans.AsOfJoin
      .asofJoin(probes, errs, Seq("user_id"), Seq("r_user"), "ts", "r_ts")
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        col("err_value"))
      .orderBy(col("event_id"))
  }

  private val q41Sql =
    """WITH r AS (
      |  SELECT user_id AS r_user, CAST(ts AS TIMESTAMP) AS r_ts,
      |         max_by(value, event_id) AS err_value
      |  FROM events WHERE event_type = 'error' GROUP BY 1, 2)
      |SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
      |       e.event_type, r.err_value
      |FROM events e ASOF LEFT JOIN r
      |  ON e.user_id = r.r_user AND CAST(e.ts AS TIMESTAMP) >= r.r_ts
      |ORDER BY e.event_id""".stripMargin

  // ---- q54: nearest-direction as-of lookup ------------------------------
  // Completes the as-of family (backward q38/q41, forward q53): each event
  // resolves to the purchase with the smallest |time delta| in its user's
  // stream, ties to the earlier side. Two running-frame windows over one
  // user_id exchange (ascending for prev, descending for next — both
  // incremental O(n) frames, never the quadratic unbounded-following
  // scan); no join at all; exact microsecond deltas keep the tie rule
  // portable.
  private def q54(s: SparkSession, d: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val back = W.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    // forward side as a DESCENDING running frame (the q53 rule): the
    // unbounded-following frame is O(n²) per user in Spark
    val fwd = W.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val purchase = when(col("event_type") === "purchase",
      struct(unix_micros(col("ts")).as("pus"), col("value").as("pv")))
    T.events(s, d)
      .withColumn("prev", last(purchase, ignoreNulls = true).over(back))
      .withColumn("next", last(purchase, ignoreNulls = true).over(fwd))
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("nearest_purchase_value",
        when(col("prev").isNull, col("next.pv"))
          .when(col("next").isNull, col("prev.pv"))
          .when(col("us") - col("prev.pus") <= col("next.pus") - col("us"),
            col("prev.pv"))
          .otherwise(col("next.pv")))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        col("nearest_purchase_value"))
      .orderBy(col("event_id"))
  }

  private val q54Sql =
    """WITH x AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
      |    last_value(CASE WHEN event_type = 'purchase' THEN
      |        struct_pack(pus := epoch_us(CAST(ts AS TIMESTAMP)), pv := value)
      |      END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev,
      |    first_value(CASE WHEN event_type = 'purchase' THEN
      |        struct_pack(pus := epoch_us(CAST(ts AS TIMESTAMP)), pv := value)
      |      END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next
      |  FROM events)
      |SELECT event_id, user_id, ts, event_type,
      |  CASE WHEN prev IS NULL THEN next.pv
      |       WHEN next IS NULL THEN prev.pv
      |       WHEN us - prev.pus <= next.pus - us THEN prev.pv
      |       ELSE next.pv END AS nearest_purchase_value
      |FROM x ORDER BY event_id""".stripMargin

  override val defs: Seq[(String, QueryDef)] = Seq(
    "q36_generator_outer" -> QueryDef(q36, Some(q36Sql)),
    "q37_json_source_bcdiv" -> QueryDef(q37, Some(q37Sql)),
    "q38_asof_join" -> QueryDef(q38, Some(q38Sql)),
    "q53_asof_forward" -> QueryDef(q53, Some(q53Sql)),
    "q54_asof_nearest" -> QueryDef(q54, Some(q54Sql)),
    "q39_skew_salted_join" -> QueryDef(q39, Some(q39Sql)),
    "q41_asof_native" -> QueryDef(q41, Some(q41Sql)),
  )
}
