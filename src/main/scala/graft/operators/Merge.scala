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

  override val defs: Seq[(String, QueryDef)] = Seq(
    "q47_merge_upsert" -> QueryDef(q47, Some(q47Sql)))
}
