package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

import graft.core.{QueryDef, QueryGroup, Tables => T}

/** Relational core of the declared inventory (SURVEY.md §2B Q01–Q19, Q28).
  *
  * Every query ends in a total-order `ORDER BY` over a unique key and keeps
  * money arithmetic in exact decimals (SURVEY.md §7.4) so results are
  * hash-stable against the DuckDB oracle. Scale notes per query: joins that
  * have a small side are explicitly `broadcast`; large-side joins shuffle on
  * their equi-keys and are AQE/skew-safe (no driver-side collection).
  */
object Relational extends QueryGroup {
  import T.{dec, decr, avgExact}

  // ---- Q01: parquet scan + global agg + exact distinct ----------------
  private def q01(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d).agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("l_orderkey")).as("n_orders"))

  private val q01Sql =
    "SELECT COUNT(*) AS n_rows, COUNT(DISTINCT l_orderkey) AS n_orders FROM lineitem"

  // ---- Q02: the reference batch job, verbatim semantics ---------------
  // TSV scan with header, NO type inference (all columns string) →
  // groupBy(product_category).count() — /root/reference/scripts/
  // spark_converter.py:25-28. Fixture TSV is generated deterministically.
  private def q02(s: SparkSession, d: String): DataFrame = {
    val path = ReviewsTsv.ensure()
    s.read.option("sep", "\t").option("header", "true").csv(path)
      .groupBy(col("product_category"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("product_category"))
  }

  private val q02Sql =
    s"""SELECT product_category, COUNT(*) AS cnt
       |FROM read_csv('${ReviewsTsv.path}', delim='\t', header=true, all_varchar=true)
       |GROUP BY product_category ORDER BY product_category""".stripMargin

  // ---- Q03: projection + filter (pushdown-checked in tests) -----------
  private def q03(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  private val q03Sql =
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---- Q04: TPC-H Q1 shape — multi-agg in exact decimals ---------------
  private def q04(s: SparkSession, d: String): DataFrame = {
    val l = T.lineitem(s, d)
    // Product terms use scale-2 operands (the generated data is exactly
    // 2-decimal, so the casts are lossless): disc_price sums at scale 4,
    // charge at scale 6, keeping unscaled sums < 2^53 up to ~sf1. That
    // bound matters: DuckDB's wide-decimal→DOUBLE conversion rounds twice
    // (hugeint significand → double, then ÷10^scale) and is 1 ulp off
    // Spark's correctly-rounded BigDecimal.doubleValue once the unscaled
    // value exceeds 2^53 — observed live on scale-12 charge sums at sf0.01.
    //
    // r15: the per-row arithmetic runs on UNSCALED LONGS. The former
    // per-row double→decimal casts went through Double.toString +
    // BigDecimal parse (6 casts × every row — the whole stage was one
    // task on this single-row-group fixture and ~2.4 s of it was this),
    // where (x·10^s + 0.5)::long is three codegen-primitive ops giving
    // the same unscaled integer for the non-negative exactly-2-decimal
    // data (the identical data contract the decimal casts already rely
    // on — a tie can't be exercised, so HALF_UP floor-for-positives
    // agree). Long sums are exact (< 2^63 by the same bound that keeps
    // the doubles correct); ONLY the output edge converts: each
    // group-total long becomes an exact DECIMAL and divides by 10^s
    // (exact — the quotient's true scale ≤ s < result scale), then one
    // correctly-rounded cast to double — bit-identical to summing exact
    // decimals, which the oracle re-grades every run.
    import T.{unscaled => u, unscaledToDouble => scaled}
    val ep2 = u(col("l_extendedprice"), 100)
    val discU4 = ep2 * (lit(100L) - u(col("l_discount"), 100))
    val chargeU6 = discU4 * (lit(100L) + u(col("l_tax"), 100))
    val n = count(lit(1))
    l.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        scaled(sum(u(col("l_quantity"), 10000)), 10000).as("sum_qty"),
        scaled(sum(u(col("l_extendedprice"), 10000)), 10000)
          .as("sum_base_price"),
        scaled(sum(discU4), 10000).as("sum_disc_price"),
        scaled(sum(chargeU6), 1000000).as("sum_charge"),
        (scaled(sum(u(col("l_quantity"), 10000)), 10000) / n).as("avg_qty"),
        (scaled(sum(u(col("l_extendedprice"), 10000)), 10000) / n)
          .as("avg_price"),
        (scaled(sum(u(col("l_discount"), 10000)), 10000) / n).as("avg_disc"),
        n.as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  private val q04Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---- Q05: broadcast equi-inner join (dim ⋈ dim) ----------------------
  private def q05(s: SparkSession, d: String): DataFrame =
    T.nation(s, d)
      .join(broadcast(T.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"), col("r_name"))
      .orderBy(col("n_nationkey"))

  private val q05Sql =
    """SELECT n_nationkey, n_name, r_name FROM nation
      |JOIN region ON n_regionkey = r_regionkey ORDER BY n_nationkey""".stripMargin

  // ---- Q06: TPC-H Q3 shape — 3-way join + agg + top-k ------------------
  // customer (small) is broadcast; orders ⋈ lineitem shuffles on the order
  // key; top-10 runs as TakeOrderedAndProject (no global sort at scale).
  private def q06(s: SparkSession, d: String): DataFrame = {
    val c = T.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = T.orders(s, d)
    val l = T.lineitem(s, d)
    // revenue on unscaled longs (the q04 move): ep(12,4) × (1−disc)(6,4)
    // has true scale 8 on 2-decimal data, so the per-row product is
    // ep_u4 · (10^4 − d_u4) — primitive long math replacing two
    // string-parsing decimal casts per row; the per-group total
    // converts once through the exact-division edge (bit-identical,
    // oracle re-graded)
    import T.{unscaled => u, unscaledToDouble => scaled}
    broadcast(c).join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(scaled(sum(u(col("l_extendedprice"), 10000) *
        (lit(10000L) - u(col("l_discount"), 10000))), 100000000)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  private val q06Sql =
    """SELECT o_orderkey, o_orderdate,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))) AS DOUBLE) AS revenue
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY o_orderkey, o_orderdate
      |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin

  // ---- Q07: left outer join + count-including-zero ---------------------
  private def q07(s: SparkSession, d: String): DataFrame =
    T.customer(s, d)
      .join(T.orders(s, d), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy(col("c_custkey"))

  private val q07Sql =
    """SELECT c_custkey, COUNT(o_orderkey) AS n_orders FROM customer
      |LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin

  // ---- Q08: left semi (EXISTS) -----------------------------------------
  private def q08(s: SparkSession, d: String): DataFrame = {
    val big = T.orders(s, d).filter(col("o_totalprice") > 100000)
      .select(col("o_custkey"))
    T.customer(s, d)
      .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  private val q08Sql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_totalprice > 100000)
      |ORDER BY c_custkey""".stripMargin

  // ---- Q09: left anti (NOT EXISTS) -------------------------------------
  private def q09(s: SparkSession, d: String): DataFrame =
    T.customer(s, d)
      .join(T.orders(s, d).filter(col("o_totalprice") > 400000)
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  private val q09Sql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      |ORDER BY c_custkey""".stripMargin

  // ---- Q10: theta/range self-join on events ----------------------------
  // Interval-join decomposition: a 5-minute range predicate means a match
  // can only live in the same or the next 5-minute time bucket, so the
  // left side explodes to (bucket, bucket+1) and the join key becomes
  // (user_id, bucket). Candidate pairs are bounded per (user, bucket)
  // instead of per user — the shape that survives hot users at 100 TB.
  // The exact range predicates remain on the join, so semantics equal the
  // plain theta join.
  private def q10(s: SparkSession, d: String): DataFrame = {
    val ev = T.events(s, d)
      .select(col("event_id"), col("ts"), col("user_id"))
      .withColumn("b", floor(unix_timestamp(col("ts")) / 300).cast(LongType))
    val e1 = ev.withColumn("jb", explode(array(col("b"), col("b") + 1)))
      .drop("b").as("e1")
    val e2 = ev.as("e2")
    e1.join(e2,
        col("e1.user_id") === col("e2.user_id") &&
        col("e1.jb") === col("e2.b") &&
        col("e2.ts") >= col("e1.ts") &&
        col("e2.ts") <= col("e1.ts") + expr("INTERVAL 5 MINUTES") &&
        col("e1.event_id") < col("e2.event_id"))
      .groupBy(col("e1.user_id").as("user_id"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("user_id"))
  }

  private val q10Sql =
    """SELECT e1.user_id AS user_id, COUNT(*) AS n_pairs
      |FROM events e1 JOIN events e2
      |  ON e1.user_id = e2.user_id
      | AND e2.ts >= e1.ts AND e2.ts <= e1.ts + INTERVAL 5 MINUTE
      | AND e1.event_id < e2.event_id
      |GROUP BY e1.user_id ORDER BY user_id""".stripMargin

  // ---- Q11: cross join --------------------------------------------------
  private def q11(s: SparkSession, d: String): DataFrame =
    T.region(s, d).crossJoin(T.nation(s, d))
      .select(col("r_name"), col("n_name"))
      .orderBy(col("r_name"), col("n_name"))

  private val q11Sql =
    """SELECT r_name, n_name FROM region CROSS JOIN nation
      |ORDER BY r_name, n_name""".stripMargin

  // ---- Q12: rollup ------------------------------------------------------
  private def q12(s: SparkSession, d: String): DataFrame =
    T.customer(s, d)
      .join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(T.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        grouping(col("r_name")).cast(LongType).as("g_r"),
        grouping(col("n_name")).cast(LongType).as("g_n"))
      .orderBy(col("g_r"), col("g_n"), col("r_name"), col("n_name"))

  private val q12Sql =
    """SELECT r_name, n_name, COUNT(*) AS n_customers,
      |  CAST(GROUPING(r_name) AS BIGINT) AS g_r,
      |  CAST(GROUPING(n_name) AS BIGINT) AS g_n
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY g_r, g_n, r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin

  // ---- Q13: cube + grouping_id ------------------------------------------
  private def q13(s: SparkSession, d: String): DataFrame =
    T.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("o_totalprice"))).cast(DoubleType).as("sum_price"),
        grouping_id().cast(LongType).as("gid"))
      .orderBy(col("gid"), col("o_orderstatus"), col("o_orderpriority"))

  private val q13Sql =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) AS sum_price,
      |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  // ---- Q14: ranking window functions ------------------------------------
  private def q14(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    T.customer(s, d)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        row_number().over(w).cast(LongType).as("rn"),
        rank().over(w).cast(LongType).as("rnk"),
        dense_rank().over(w).cast(LongType).as("drnk"))
      .filter(col("rn") <= 3)
      .orderBy(col("c_mktsegment"), col("rn"))
  }

  private val q14Sql =
    """SELECT * FROM (
      |  SELECT c_mktsegment, c_custkey, c_acctbal,
      |    CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
      |    CAST(RANK() OVER w AS BIGINT) AS rnk,
      |    CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk
      |  FROM customer
      |  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
      |) WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin

  // ---- Q15: analytic window + row frame ---------------------------------
  private def q15(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wMov = w.rowsBetween(-2, Window.currentRow)
    T.orders(s, d).select(
      col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
      sum(dec(col("o_totalprice"))).over(wRun)
        .cast(DoubleType).as("running_total"),
      lag(col("o_orderdate"), 1).over(w).as("prev_date"),
      lead(col("o_orderdate"), 1).over(w).as("next_date"),
      (sum(dec(col("o_totalprice"))).over(wMov).cast(DoubleType) /
        count(lit(1)).over(wMov)).as("mov_avg3"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  private val q15Sql =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) OVER wr AS DOUBLE) AS running_total,
      |  LAG(o_orderdate, 1) OVER w AS prev_date,
      |  LEAD(o_orderdate, 1) OVER w AS next_date,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) OVER wm AS DOUBLE) / COUNT(*) OVER wm AS mov_avg3
      |FROM orders
      |WINDOW
      |  w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |  wr AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |  wm AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  // ---- Q16: range frame --------------------------------------------------
  // RANGE frame over the decimal-cast acctbal: peers (equal acctbal) share
  // a running total, so the result is deterministic even under ties.
  private def q16(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("s_nationkey")).orderBy(col("acctbal"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    T.supplier(s, d)
      .select(col("s_suppkey"), col("s_nationkey"),
        dec(col("s_acctbal")).as("acctbal"))
      .withColumn("running", sum(col("acctbal")).over(w))
      // the RANGE frame runs over exact decimals; outputs go out as double
      .select(col("s_suppkey"), col("s_nationkey"),
        col("acctbal").cast(DoubleType).as("acctbal"),
        col("running").cast(DoubleType).as("running"))
      .orderBy(col("s_suppkey"))
  }

  private val q16Sql =
    """SELECT s_suppkey, s_nationkey,
      |  CAST(CAST(s_acctbal AS DECIMAL(12,4)) AS DOUBLE) AS acctbal,
      |  CAST(SUM(CAST(s_acctbal AS DECIMAL(12,4))) OVER (
      |    PARTITION BY s_nationkey ORDER BY CAST(s_acctbal AS DECIMAL(12,4))
      |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
      |FROM supplier ORDER BY s_suppkey""".stripMargin

  // ---- Q17: global top-k -------------------------------------------------
  private def q17(s: SparkSession, d: String): DataFrame =
    T.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(25)

  private val q17Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin

  // ---- Q18: set operations ----------------------------------------------
  private def building(s: SparkSession, d: String): DataFrame =
    T.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))

  private def bigSpenders(s: SparkSession, d: String): DataFrame =
    T.orders(s, d).filter(col("o_totalprice") > 300000)
      .select(col("o_custkey").as("c_custkey"))

  private def q18a(s: SparkSession, d: String): DataFrame =
    building(s, d).union(bigSpenders(s, d)).distinct().orderBy(col("c_custkey"))

  private def q18b(s: SparkSession, d: String): DataFrame =
    building(s, d).intersect(bigSpenders(s, d)).orderBy(col("c_custkey"))

  private def q18c(s: SparkSession, d: String): DataFrame =
    building(s, d).except(bigSpenders(s, d)).orderBy(col("c_custkey"))

  private def setOpSql(op: String) =
    s"""SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
       |$op
       |SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000
       |ORDER BY c_custkey""".stripMargin

  // ---- Q19: exact distinct / dedup --------------------------------------
  private def q19a(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d).select(col("l_returnflag"), col("l_linestatus"))
      .distinct()
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val q19aSql =
    """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // Exact duplicate-row removal: group by full content key, keep min id.
  // Scales as a single hash aggregation on the content key.
  private def q19b(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .groupBy(col("text"), col("lang"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("lang"), col("n_copies"))
      .orderBy(col("doc_id"))

  private val q19bSql =
    """SELECT MIN(doc_id) AS doc_id, lang, COUNT(*) AS n_copies
      |FROM documents GROUP BY text, lang ORDER BY doc_id""".stripMargin

  // ---- Q28: scalar + IN subqueries (via spark.sql → ScalarSubquery) ----
  // Temp views are named per data-dir so concurrent runs (or a user
  // session with its own `orders` view) cannot collide; the oracle SQL
  // keeps the plain table names.
  private def viewSuffix(d: String): String =
    java.lang.Integer.toHexString(d.hashCode)

  private def q28a(s: SparkSession, d: String): DataFrame = {
    val v = s"graft_orders_${viewSuffix(d)}"
    T.orders(s, d).createOrReplaceTempView(v)
    s.sql(q28aSql.replaceAll("\\borders\\b", v))
  }

  private val q28aSql =
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE o_totalprice > (
      |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*)
      |  FROM orders)
      |ORDER BY o_orderkey""".stripMargin

  private def q28b(s: SparkSession, d: String): DataFrame = {
    val (vc, vn, vr) = (s"graft_customer_${viewSuffix(d)}",
      s"graft_nation_${viewSuffix(d)}", s"graft_region_${viewSuffix(d)}")
    T.customer(s, d).createOrReplaceTempView(vc)
    T.nation(s, d).createOrReplaceTempView(vn)
    T.region(s, d).createOrReplaceTempView(vr)
    s.sql(q28bSql.replaceAll("\\bcustomer\\b", vc)
      .replaceAll("\\bnation\\b", vn).replaceAll("\\bregion\\b", vr))
  }

  private val q28bSql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_nationkey IN (
      |  SELECT n_nationkey FROM nation
      |  WHERE n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name = 'ASIA'))
      |ORDER BY c_custkey""".stripMargin

  // q28c: correlated EXISTS / NOT EXISTS — a distinct planner path from
  // q28a/b (RewritePredicateSubquery turns these into left-semi and
  // left-anti joins on the correlation key, so the 100 TB shape is two
  // key-partitioned joins, never a per-row subquery). SQL passthrough:
  // one text, both engines.
  private def q28c(s: SparkSession, d: String): DataFrame = {
    val (vo, vl) = (s"graft_orders_${viewSuffix(d)}",
      s"graft_lineitem_${viewSuffix(d)}")
    T.orders(s, d).createOrReplaceTempView(vo)
    T.lineitem(s, d).createOrReplaceTempView(vl)
    s.sql(q28cSql.replaceAll("\\borders\\b", vo)
      .replaceAll("\\blineitem\\b", vl))
  }

  private val q28cSql =
    """SELECT o_orderkey, o_totalprice FROM orders o
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = o.o_orderkey
      |                AND l2.l_returnflag = 'R')
      |ORDER BY o_orderkey""".stripMargin

  // q28d: LATERAL correlated top-k — the per-row subquery surface (each
  // customer's two most expensive orders). Spark plans the lateral as a
  // DomainJoin → rewritten window/limit per key; the declarative form
  // keeps it a key-partitioned shape rather than a driver loop.
  private def q28d(s: SparkSession, d: String): DataFrame = {
    val (vc, vo) = (s"graft_customer_${viewSuffix(d)}",
      s"graft_orders_${viewSuffix(d)}")
    T.customer(s, d).createOrReplaceTempView(vc)
    T.orders(s, d).createOrReplaceTempView(vo)
    s.sql(q28dSql.replaceAll("\\bcustomer\\b", vc)
      .replaceAll("\\borders\\b", vo))
  }

  private val q28dSql =
    """SELECT c_custkey, t.o_orderkey, t.o_totalprice
      |FROM customer c, LATERAL (
      |  SELECT o_orderkey, o_totalprice FROM orders
      |  WHERE o_custkey = c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      |ORDER BY c_custkey, t.o_orderkey""".stripMargin

  override val defs: Seq[(String, QueryDef)] = Seq(
    "q01_scan_agg"      -> QueryDef(q01, Some(q01Sql)),
    "q02_tsv_converter" -> QueryDef(q02, Some(q02Sql)),
    "q03_filter_project" -> QueryDef(q03, Some(q03Sql)),
    "q04_groupagg_tpch1" -> QueryDef(q04, Some(q04Sql)),
    "q05_broadcast_join" -> QueryDef(q05, Some(q05Sql)),
    "q06_join3_topk"    -> QueryDef(q06, Some(q06Sql)),
    "q07_left_outer"    -> QueryDef(q07, Some(q07Sql)),
    "q08_left_semi"     -> QueryDef(q08, Some(q08Sql)),
    "q09_left_anti"     -> QueryDef(q09, Some(q09Sql)),
    "q10_range_join"    -> QueryDef(q10, Some(q10Sql)),
    "q11_cross_join"    -> QueryDef(q11, Some(q11Sql)),
    "q12_rollup"        -> QueryDef(q12, Some(q12Sql)),
    "q13_cube"          -> QueryDef(q13, Some(q13Sql)),
    "q14_window_rank"   -> QueryDef(q14, Some(q14Sql)),
    "q15_window_frame"  -> QueryDef(q15, Some(q15Sql)),
    "q16_window_range"  -> QueryDef(q16, Some(q16Sql)),
    "q17_topk"          -> QueryDef(q17, Some(q17Sql)),
    "q18a_union"        -> QueryDef(q18a, Some(setOpSql("UNION"))),
    "q18b_intersect"    -> QueryDef(q18b, Some(setOpSql("INTERSECT"))),
    "q18c_except"       -> QueryDef(q18c, Some(setOpSql("EXCEPT"))),
    "q19a_distinct"     -> QueryDef(q19a, Some(q19aSql)),
    "q19b_dedup_exact"  -> QueryDef(q19b, Some(q19bSql)),
    "q28a_scalar_subquery" -> QueryDef(q28a, Some(q28aSql)),
    "q28b_in_subquery"  -> QueryDef(q28b, Some(q28bSql)),
    "q28c_exists_subquery" -> QueryDef(q28c, Some(q28cSql)),
    "q28d_lateral_topk" -> QueryDef(q28d, Some(q28dSql)),
  )
}
