package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, QueryGroup, Tables => T}

/** Schema-driven data profiling (the Deequ/profiler capability class):
  * one pass over the table computes null count and exact distinct count
  * for EVERY column, then unpivots to one row per column.
  *
  * Scale shape: a single hash aggregation over the scan — 2 aggregate
  * expressions per column, no per-column jobs, no driver loop over data
  * (the loop below iterates the SCHEMA, not rows). At 100 TB this is one
  * shuffle-free partial agg + one 1-row exchange; exact distinct counts
  * make it the oracle-checkable twin of the approx_count_distinct
  * profile you'd run when ±2% suffices.
  */
object Profiling extends QueryGroup {

  private def profile(s: SparkSession, d: String): DataFrame = {
    val orders = T.orders(s, d)
    val cols = orders.schema.fieldNames.toSeq
    val aggs = cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"),
        count_distinct(col(c)).as(s"dist_$c"))
    } :+ count(lit(1)).as("n_rows")
    val one = orders.agg(aggs.head, aggs.tail: _*)
    val stacked = one.select(explode(array(cols.map(c =>
      struct(lit(c).as("col_name"),
        col(s"nulls_$c").cast("long").as("n_nulls"),
        col(s"dist_$c").cast("long").as("n_distinct"),
        col("n_rows").cast("long").as("n_rows"))): _*)).as("p"))
    stacked.select(col("p.col_name"), col("p.n_nulls"),
      col("p.n_distinct"), col("p.n_rows"))
      .orderBy(col("col_name"))
  }

  private val profileSql =
    """WITH a AS (SELECT
      |  COUNT(*) AS n_rows,
      |  CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_o_orderkey,
      |  COUNT(DISTINCT o_orderkey) AS dist_o_orderkey,
      |  CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_o_custkey,
      |  COUNT(DISTINCT o_custkey) AS dist_o_custkey,
      |  CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_o_orderstatus,
      |  COUNT(DISTINCT o_orderstatus) AS dist_o_orderstatus,
      |  CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_o_totalprice,
      |  COUNT(DISTINCT o_totalprice) AS dist_o_totalprice,
      |  CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_o_orderdate,
      |  COUNT(DISTINCT o_orderdate) AS dist_o_orderdate,
      |  CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_o_orderpriority,
      |  COUNT(DISTINCT o_orderpriority) AS dist_o_orderpriority
      |FROM orders)
      |SELECT col_name, n_nulls, n_distinct, n_rows FROM (
      |  SELECT 'o_orderkey' AS col_name, nulls_o_orderkey AS n_nulls, dist_o_orderkey AS n_distinct, n_rows FROM a
      |  UNION ALL SELECT 'o_custkey', nulls_o_custkey, dist_o_custkey, n_rows FROM a
      |  UNION ALL SELECT 'o_orderstatus', nulls_o_orderstatus, dist_o_orderstatus, n_rows FROM a
      |  UNION ALL SELECT 'o_totalprice', nulls_o_totalprice, dist_o_totalprice, n_rows FROM a
      |  UNION ALL SELECT 'o_orderdate', nulls_o_orderdate, dist_o_orderdate, n_rows FROM a
      |  UNION ALL SELECT 'o_orderpriority', nulls_o_orderpriority, dist_o_orderpriority, n_rows FROM a)
      |ORDER BY col_name""".stripMargin

  override val defs: Seq[(String, QueryDef)] = Seq(
    "profile_columns" -> QueryDef(profile, Some(profileSql)))
}
