package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.core.{QueryDef, QueryGroup, Tables => T}

/** CDC apply / SCD-1 merge: fold a change set (full-row upserts +
  * deletes) into a base table.
  *
  * Shape: the broadcast-friendly two-pass form — `base ANTI-JOIN touched
  * keys` (broadcastable: the change-key set is small relative to base,
  * the common CDC regime) unioned with the surviving upsert rows. Unlike
  * a full-outer merge join, the base side is never shuffled, so a 100 TB
  * base with a 10 GB change set stays a broadcast anti-join + union —
  * no wide exchange at all. Upsert semantics: a change row replaces the
  * whole base row when the key matches and inserts otherwise; deletes
  * drop the base row.
  */
object Merge extends QueryGroup {

  /** General operator: apply `changes` (op ∈ U/I/D, full rows for U/I)
    * to `base` on `key`. The change set must carry at most ONE change per
    * key — asserted loudly (same contract as the streaming twin's
    * no-seqCol path): two surviving upserts for one key would silently
    * break key uniqueness in the output, and which should win is
    * unknowable without a sequence. Pre-fold with a last-wins reduction
    * (StreamMerge does) when the source can emit several, and pass
    * `preFolded = true` to skip the eager duplicate-key pass — the check
    * is a full extra scan of the changes lineage, pure waste when the
    * caller has already reduced to one change per key. */
  def applyChanges(base: DataFrame, changes: DataFrame, key: String,
      opCol: String = "op", preFolded: Boolean = false): DataFrame = {
    if (!preFolded) {
      val dup = changes.groupBy(col(key)).agg(count(lit(1)).as("n"))
        .filter(col("n") > 1).limit(1).collect()
      if (dup.nonEmpty) throw new IllegalStateException(
        s"merge: change set carries ${dup.head.getLong(1)} changes for key " +
          s"${dup.head.get(0)} — fold to one change per key first")
    }
    val touched = changes.select(col(key)).distinct()
    // no broadcast() hint: a hint would FORCE broadcasting even when a
    // bulk backfill makes the change set huge. AQE sees the real size at
    // runtime and picks the broadcast anti-join whenever it fits (the
    // common CDC regime, asserted in MergeSpec), degrading to a shuffle
    // join instead of an executor OOM otherwise.
    val untouched = base.join(touched, Seq(key), "left_anti")
    val upserts = changes.filter(col(opCol) =!= "D").drop(opCol)
    untouched.withColumn("src", lit("base"))
      .unionByName(upserts.withColumn("src", lit("upsert")))
  }

  // ---- q47_merge_upsert: deterministic change set over orders -----------
  // Changes derived from the base itself so the fixture needs no extra
  // table: keys %17==0 are deletes, keys %10==0 (and not deleted) arrive
  // as full-row updates with repriced totals, and fresh keys (base key +
  // 10^9) are inserts. Money stays in DECIMAL(12,4) through the
  // arithmetic and is cast DOUBLE only at the output edge.
  private def priced(c: Column) = T.dec(c)

  private def q47(s: SparkSession, d: String): DataFrame = {
    val base = T.orders(s, d).select(col("o_orderkey"),
      priced(col("o_totalprice")).as("price"), col("o_orderstatus"))
    val del = base.filter(col("o_orderkey") % 17 === 0)
      .select(col("o_orderkey"), col("price"), col("o_orderstatus"),
        lit("D").as("op"))
    val upd = base.filter(col("o_orderkey") % 10 === 0 &&
        col("o_orderkey") % 17 =!= 0)
      .select(col("o_orderkey"),
        // decimal literal: a bare 1.5 is a DOUBLE and would poison the
        // decimal addition into double arithmetic
        (col("price") + lit(BigDecimal("1.5")).cast(DecimalType(6, 4)))
          .cast(DecimalType(12, 4)).as("price"),
        lit("R").as("o_orderstatus"), lit("U").as("op"))
    val ins = base.filter(col("o_orderkey") % 100 === 0)
      .select((col("o_orderkey") + 1000000000L).as("o_orderkey"),
        col("price"), lit("N").as("o_orderstatus"), lit("I").as("op"))
    val changes = del.unionByName(upd).unionByName(ins)
    applyChanges(base, changes, "o_orderkey")
      .select(col("o_orderkey"),
        col("price").cast(DoubleType).as("o_totalprice"),
        col("o_orderstatus"), col("src"))
      .orderBy(col("o_orderkey"))
  }

  private val q47Sql =
    """WITH base AS (SELECT o_orderkey,
      |    CAST(o_totalprice AS DECIMAL(12,4)) AS price, o_orderstatus
      |  FROM orders),
      |del AS (SELECT o_orderkey FROM base WHERE o_orderkey % 17 = 0),
      |upd AS (SELECT o_orderkey,
      |    CAST(price + 1.5 AS DECIMAL(12,4)) AS price,
      |    'R' AS o_orderstatus
      |  FROM base WHERE o_orderkey % 10 = 0 AND o_orderkey % 17 <> 0),
      |ins AS (SELECT o_orderkey + 1000000000 AS o_orderkey, price,
      |    'N' AS o_orderstatus
      |  FROM base WHERE o_orderkey % 100 = 0),
      |touched AS (SELECT o_orderkey FROM del
      |  UNION SELECT o_orderkey FROM upd
      |  UNION SELECT o_orderkey FROM ins)
      |SELECT o_orderkey, CAST(price AS DOUBLE) AS o_totalprice,
      |  o_orderstatus, src FROM (
      |  SELECT b.*, 'base' AS src FROM base b
      |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM touched)
      |  UNION ALL SELECT *, 'upsert' AS src FROM upd
      |  UNION ALL SELECT *, 'upsert' AS src FROM ins)
      |ORDER BY o_orderkey""".stripMargin

  // ---- merge_scd2: change log → SCD Type-2 dimension history ------------
  // The warehouse-side complement of the SCD-1 upsert above: instead of
  // overwriting, every state CHANGE opens a dated version row. The event
  // stream is the change log (user_id = dimension key, event_type = the
  // tracked attribute); consecutive repeats of the same state collapse
  // (they are not changes), then each survivor gets
  // [effective_from, effective_to) validity from its own ts and the next
  // survivor's ts, open-ended for the current version.
  //
  // Scale shape: ONE exchange + sort on (user_id; ts, event_id) feeds all
  // four window functions — the collapse lag, the version row_number, and
  // the lead pair — because they share the same WindowSpec ordering, so
  // Spark reuses the sort across both Window operators (exchange reuse
  // asserted for the family in PlanSpec's window queries). Per-key state
  // is a single row; no join, no driver collect; 100 TB = one wide
  // exchange keyed by the dimension key, exactly what SCD2 requires.
  private def scd2(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val changed = T.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
    changed
      .select(col("user_id"),
        row_number().over(w).cast("long").as("version"),
        col("event_type").as("state"),
        col("ts").as("effective_from"),
        lead(col("ts"), 1).over(w).as("effective_to"),
        lead(col("ts"), 1).over(w).isNull.as("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  private val scd2Sql =
    """WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
      |    event_type FROM events),
      |chg AS (SELECT *, lag(event_type) OVER
      |    (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM ev),
      |surv AS (SELECT user_id, ts, event_id, event_type FROM chg
      |  WHERE prev IS NULL OR prev <> event_type)
      |SELECT user_id, row_number() OVER w AS version, event_type AS state,
      |  ts AS effective_from, lead(ts) OVER w AS effective_to,
      |  lead(ts) OVER w IS NULL AS is_current
      |FROM surv WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, version""".stripMargin

  // ---- q58_pit_join: point-in-time join against SCD2 history -------------
  // The feature-store correctness primitive: each purchase event resolves
  // to the dimension VERSION that was valid at the purchase instant
  // ([effective_from, effective_to) interval semantics over the
  // merge_scd2 history above) — never the current row, which would leak
  // the future into training features.
  //
  // Scale-first formulation: NOT an interval join (Spark plans range
  // predicates on big tables as shuffled range joins at best). Version
  // opens and purchases union onto one (user_id; time) axis and a
  // last(ignoreNulls) carry-forward picks each purchase's governing
  // version — the as-of shape, ONE exchange + sort keyed by user_id, no
  // join at all. At equal timestamps version rows sort BEFORE purchases
  // (`kind` in the ordering) and by version number, so a purchase at an
  // exact boundary takes the version opening at that instant and
  // zero-length versions (two changes at one instant) are skipped over —
  // exactly the [from, to) semantics. The ORACLE, by contrast, runs the
  // DECLARATIVE interval join — the point of the query: the linear
  // carry-forward must equal interval semantics row for row.
  private def q58(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val versions = scd2(s, d)
      .select(col("user_id"), col("effective_from").as("t"),
        lit(0).as("kind"), lit(null).cast("long").as("event_id"),
        struct(col("version"), col("state")).as("ver"))
    val purchases = T.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("t"),
        lit(1).as("kind"), col("event_id"),
        lit(null).cast(versions.schema("ver").dataType).as("ver"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("kind"), col("ver.version"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    versions.unionByName(purchases)
      .withColumn("gov", last(col("ver"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("event_id"), col("user_id"), col("t").as("ts"),
        col("gov.version").as("version"), col("gov.state").as("state"))
      .orderBy(col("event_id"))
  }

  private val q58Sql =
    """WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
      |    event_type FROM events),
      |chg AS (SELECT *, lag(event_type) OVER
      |    (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM ev),
      |surv AS (SELECT user_id, ts, event_id, event_type FROM chg
      |  WHERE prev IS NULL OR prev <> event_type),
      |scd AS (SELECT user_id, row_number() OVER w AS version,
      |    event_type AS state, ts AS effective_from,
      |    lead(ts) OVER w AS effective_to
      |  FROM surv WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |p AS (SELECT user_id, ts, event_id FROM ev
      |  WHERE event_type = 'purchase')
      |SELECT p.event_id, p.user_id, p.ts,
      |  CAST(s.version AS BIGINT) AS version, s.state
      |FROM p JOIN scd s ON p.user_id = s.user_id
      |  AND s.effective_from <= p.ts
      |  AND (s.effective_to IS NULL OR p.ts < s.effective_to)
      |ORDER BY p.event_id""".stripMargin

  // ---- merge_cdc_fold: raw multi-change-per-key log → fold → apply -------
  // Real CDC streams (Debezium, binlog tailers) deliver MANY changes per
  // key per batch; q47 above covers the already-compacted regime. This is
  // the other half: last-writer-wins log compaction (row_number desc on
  // the (ts, event_id) sequence per key) down to one change per key, then
  // the same broadcast-friendly anti-join apply — `applyChanges` with
  // `preFolded = true`, because the fold IS the uniqueness proof and the
  // eager duplicate-key re-check would be a wasted extra pass over the
  // log lineage.
  //
  // Deterministic fixture mapping (no extra table needed): events with
  // event_id % 3 ≠ 0 replay into the base snapshot (their own last-wins
  // fold — "yesterday's compacted state"); event_id % 3 = 0 is today's
  // changelog, where an `error` event means DELETE the key, a `signup`
  // event registers a NEW key (user_id + 1e6 → exercises the insert
  // path), and everything else is a full-row upsert.
  //
  // Scale shape: both folds are one window each on the user_id exchange;
  // the apply side never shuffles the base (AQE broadcast anti-join —
  // see applyChanges). 100 TB base + bounded daily log = the log pays
  // two small exchanges, the base pays zero.
  private def cdcFold(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def lastWins(df: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .drop("rn", "ts", "event_id")
    }
    val ev = T.events(s, d)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    val base = lastWins(ev.filter(col("event_id") % 3 =!= 0))
      .withColumnRenamed("event_type", "state")
    val log = ev.filter(col("event_id") % 3 === 0)
      .select(
        when(col("event_type") === "signup", col("user_id") + 1000000L)
          .otherwise(col("user_id")).as("user_id"),
        when(col("event_type") === "error", "D").otherwise("U").as("op"),
        col("event_type").as("state"), col("value"),
        col("ts"), col("event_id"))
    applyChanges(base, lastWins(log), "user_id", preFolded = true)
      .orderBy(col("user_id"))
      .select(col("user_id"), col("state"), col("value"), col("src"))
  }

  private val cdcFoldSql =
    """WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
      |    event_type, value FROM events),
      |b0 AS (SELECT user_id, event_type AS state, value, row_number()
      |    OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM ev WHERE event_id % 3 <> 0),
      |base AS (SELECT user_id, state, value FROM b0 WHERE rn = 1),
      |l0 AS (SELECT CASE WHEN event_type = 'signup' THEN user_id + 1000000
      |      ELSE user_id END AS user_id,
      |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
      |    event_type AS state, value, ts, event_id
      |  FROM ev WHERE event_id % 3 = 0),
      |l1 AS (SELECT *, row_number() OVER (PARTITION BY user_id
      |    ORDER BY ts DESC, event_id DESC) AS rn FROM l0),
      |chg AS (SELECT user_id, op, state, value FROM l1 WHERE rn = 1)
      |SELECT user_id, state, value, src FROM (
      |  SELECT b.user_id, b.state, b.value, 'base' AS src FROM base b
      |    WHERE b.user_id NOT IN (SELECT user_id FROM chg)
      |  UNION ALL
      |  SELECT user_id, state, value, 'upsert' AS src FROM chg
      |    WHERE op <> 'D')
      |ORDER BY user_id""".stripMargin

  override val defs: Seq[(String, QueryDef)] = Seq(
    "q47_merge_upsert" -> QueryDef(q47, Some(q47Sql)),
    "merge_scd2" -> QueryDef(scd2, Some(scd2Sql)),
    "q58_pit_join" -> QueryDef(q58, Some(q58Sql)),
    "merge_cdc_fold" -> QueryDef(cdcFold, Some(cdcFoldSql)))
}
