package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
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

  // ---- profile_fd: functional-dependency discovery ------------------------
  // The profiler step ABOVE per-column stats: which column determines
  // which (A→B ⇔ every A value maps to one B value ⇔ ndv(A) = ndv(A,B)
  // under no nulls — the TANE/Deequ uniqueness test). TPC-H hides a real
  // one: p_brand → p_mfgr (brand "Brand#xy" embeds its manufacturer), so
  // the fixture exercises both verdicts.
  //
  // Scale shape: ONE unpivot of the scan into (pair, a, b) rows — the
  // pair lattice is SCHEMA-sized (k·(k−1) for k profiled columns), the
  // loop below iterates column NAMES, never rows — then one hash agg
  // with two distinct counts per pair. Exact ndv over cols²×rows
  // expanded rows is the honest cost of exact FD discovery; at 100 TB
  // you run this on a sample or swap ndv for HLL sketches, and this is
  // the oracle-checkable exact twin (the profile_columns framing).
  //
  // The profiled set mixes raw columns with two DERIVED ones (mfgr =
  // the brand's manufacturer prefix, noun = the name's second word) so
  // the fixture carries a dependency the profiler must find
  // (p_brand → mfgr) amid pairs where none exists — the profiler, of
  // course, cannot tell derived from raw.
  private val fdCols = Seq("p_brand", "mfgr", "p_type", "p_size", "noun")

  private def fdProfile(s: SparkSession, d: String): DataFrame = {
    val base = T.part(s, d).select(col("p_brand"),
      substring(col("p_brand"), 1, 7).as("mfgr"), col("p_type"),
      col("p_size"),
      // get(), not [1]: a one-word p_name must profile as '' (degenerate
      // fixtures), not throw INVALID_ARRAY_INDEX under ANSI
      coalesce(get(split(col("p_name"), " "), lit(1)), lit(""))
        .as("noun"))
    val pairs = for { a <- fdCols; b <- fdCols if a != b } yield (a, b)
    val exploded = base.select(explode(array(pairs.map {
      case (a, b) => struct(lit(a).as("col_a"), lit(b).as("col_b"),
        col(a).cast(StringType).as("va"), col(b).cast(StringType).as("vb"))
    }: _*)).as("p")).select(col("p.*"))
    exploded.groupBy(col("col_a"), col("col_b"))
      .agg(count_distinct(col("va")).as("n_distinct_a"),
        count_distinct(col("va"), col("vb")).as("n_distinct_ab"))
      .withColumn("fd_holds", col("n_distinct_a") === col("n_distinct_ab"))
      .orderBy(col("col_a"), col("col_b"))
  }

  // generated from the SAME fdCols list as the Spark side — the pair
  // lattice cannot drift between engine and oracle
  private val fdSql = {
    val selects = (for { a <- fdCols; b <- fdCols if a != b } yield
      s"""SELECT '$a' AS col_a, '$b' AS col_b,
         |    COUNT(DISTINCT CAST($a AS VARCHAR)) AS n_distinct_a,
         |    COUNT(DISTINCT (CAST($a AS VARCHAR), CAST($b AS VARCHAR))) AS n_distinct_ab
         |  FROM base""".stripMargin).mkString("\n  UNION ALL ")
    s"""WITH base AS MATERIALIZED (
       |  SELECT p_brand, substring(p_brand, 1, 7) AS mfgr, p_type, p_size,
       |    COALESCE(string_split(p_name, ' ')[2], '') AS noun
       |  FROM part)
       |SELECT col_a, col_b, n_distinct_a, n_distinct_ab,
       |  n_distinct_a = n_distinct_ab AS fd_holds
       |FROM (
       |  $selects)
       |ORDER BY col_a, col_b""".stripMargin
  }

  // ---- q52_zorder_layout: Morton-curve clustering extents ---------------
  // The data-layout primitive: cluster by a Z-order key and row-group
  // min/max stats prune range predicates on BOTH dimensions. The query
  // reports per-curve-bucket extents of each dimension — narrow extents
  // are exactly what makes the pruning selective; a lexicographic sort
  // would show narrow custkey extents but full-width date extents. The
  // oracle replays the interleave from a SQL rendering generated by the
  // SAME Scala code as the codegen'd expression, so the two can't drift.
  private def zorderLayout(s: SparkSession, d: String): DataFrame = {
    val base = T.orders(s, d).select(
      (col("o_custkey") % 65536L).as("ck"),
      datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date"))
        .cast("long").as("dy"))
    base.select(col("ck"), col("dy"),
        graft.functions.ZOrderKey.zorderKey(col("ck"), col("dy")).as("zkey"))
      .withColumn("zbucket", expr("zkey div 1048576")) // 2^20 → ≤4096 buckets
      .groupBy(col("zbucket"))
      .agg(count(lit(1)).as("n"),
        min(col("ck")).as("ck_min"), max(col("ck")).as("ck_max"),
        min(col("dy")).as("dy_min"), max(col("dy")).as("dy_max"))
      .orderBy(col("zbucket"))
  }

  private val zorderLayoutSql = {
    val inter = graft.functions.ZOrderUtil.interleaveSql("ck", "dy16")
    s"""WITH base AS (
       |  SELECT o_custkey % 65536 AS ck,
       |    datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS dy
       |  FROM orders),
       |z AS (SELECT ck, dy, $inter AS zkey
       |      FROM (SELECT ck, dy, dy % 65536 AS dy16 FROM base))
       |SELECT zkey // 1048576 AS zbucket, COUNT(*) AS n,
       |  MIN(ck) AS ck_min, MAX(ck) AS ck_max,
       |  MIN(dy) AS dy_min, MAX(dy) AS dy_max
       |FROM z GROUP BY zbucket ORDER BY zbucket""".stripMargin
  }

  // ---- profile_correlations: exact pairwise Pearson matrix --------------
  // The numeric-profiling counterpart of profile_columns: every pair of
  // lineitem's numeric columns correlated in ONE scan — all power sums
  // (Σx, Σx², Σxy per pair) are exact decimal aggregates in a single hash
  // aggregation (Spark's built-in corr() merges partial moments in
  // partition order, which is not reproducible across engines — the q33
  // rule), then each pair's r is assembled with one pinned IEEE formula.
  // The Spark expressions AND the oracle SQL are rendered from the same
  // pair list below, so the two sides can't drift.
  //
  // Scale: 1 + 4 + 10 aggregate expressions over one scan — shuffle-free
  // partial agg + a 1-row exchange, independent of row count; the pair
  // fan-out is over the SCHEMA (k² columns), never the data.
  // Inputs are quantized to UNSCALED ×10⁴ BIGINTs (the emb_centroid_stats
  // fixed-point trick) and every power sum is an exact scale-0 integer.
  // Why not decimal sums at scale 8: a wide decimal's cast to DOUBLE is
  // double-rounded in DuckDB (int128→double, then ÷10⁸) but single-rounded
  // in Spark (BigDecimal.doubleValue) — the sf0.1 sweep caught the
  // resulting last-ulp corr divergence. Even scale-0, DuckDB's
  // hugeint→double is reconstructed from 64-bit halves (not correctly
  // rounded past 2⁶⁴), so the exact integer sums go to double THROUGH A
  // DECIMAL STRING on both engines — strtod/parseDouble are correctly
  // rounded everywhere, which closes the conversion-divergence class
  // outright. Pearson r is scale-invariant, so correlating the ×10⁴
  // integers IS correlating the original values. The decimal width of the
  // initial 4-decimal quantization differs per engine for money (Spark
  // ≤ 18 keeps products exact; DuckDB ≥ 19 forces its int128 multiply
  // path) — the VALUES are identical either way.
  private val corrCols = Seq(
    "l_quantity" -> ("DECIMAL(12,4)", "DECIMAL(12,4)"),
    "l_extendedprice" -> ("DECIMAL(18,4)", "DECIMAL(19,4)"),
    "l_discount" -> ("DECIMAL(6,4)", "DECIMAL(6,4)"),
    "l_tax" -> ("DECIMAL(6,4)", "DECIMAL(6,4)"))
  private val corrPairs =
    for { i <- corrCols.indices; j <- corrCols.indices if i < j }
      yield (corrCols(i)._1, corrCols(j)._1)

  private def profileCorr(s: SparkSession, d: String): DataFrame = {
    val li = T.lineitem(s, d)
    // unscaled ×10⁴ long; every per-row product fits a long (price·10⁴ ≤
    // 1e9 → square ≤ 1e18 < 2⁶³), each product is widened to DECIMAL(38,0)
    // before the sum so the aggregate itself can't wrap
    def u(c: String) =
      expr(s"CAST(CAST($c AS ${corrCols.toMap.apply(c)._1}) * 10000 AS BIGINT)")
    def wide(e: org.apache.spark.sql.Column) =
      e.cast(org.apache.spark.sql.types.DecimalType(38, 0))
    def viaString(e: org.apache.spark.sql.Column) =
      e.cast("string").cast("double")
    val sums = corrCols.map { case (c, _) =>
      Seq(viaString(sum(wide(u(c)))).as(s"s_$c"),
        viaString(sum(wide(u(c) * u(c)))).as(s"s2_$c"))
    }.flatten ++ corrPairs.map { case (a, b) =>
      viaString(sum(wide(u(a) * u(b)))).as(s"sp_${a}_$b")
    } :+ count(lit(1)).as("n")
    val one = li.agg(sums.head, sums.tail: _*)
    val n = col("n").cast("double")
    def r(a: String, b: String) = Stats.pearson(n,
      col(s"s_$a"), col(s"s2_$a"), col(s"s_$b"), col(s"s2_$b"),
      col(s"sp_${a}_$b"))
    one.select(explode(array(corrPairs.map { case (a, b) =>
        struct(lit(a).as("col_a"), lit(b).as("col_b"),
          col("n").cast("long").as("n"), r(a, b).as("corr"))
      }: _*)).as("p"))
      .select(col("p.col_a"), col("p.col_b"), col("p.n"), col("p.corr"))
      .orderBy(col("col_a"), col("col_b"))
  }

  private val profileCorrSql = {
    def u(c: String) =
      s"CAST(CAST($c AS ${corrCols.toMap.apply(c)._2}) * 10000 AS BIGINT)"
    val sums = corrCols.map { case (c, _) =>
      s"CAST(CAST(SUM(${u(c)}) AS VARCHAR) AS DOUBLE) AS s_$c,\n" +
        s"  CAST(CAST(SUM(CAST(${u(c)} AS HUGEINT) * ${u(c)}) AS VARCHAR) AS DOUBLE) AS s2_$c"
    } ++ corrPairs.map { case (a, b) =>
      s"CAST(CAST(SUM(CAST(${u(a)} AS HUGEINT) * ${u(b)}) AS VARCHAR) AS DOUBLE) AS sp_${a}_$b"
    }
    val rows = corrPairs.map { case (a, b) =>
      val dx = s"(CAST(n AS DOUBLE) * s2_$a - s_$a * s_$a)"
      val dy = s"(CAST(n AS DOUBLE) * s2_$b - s_$b * s_$b)"
      s"SELECT '$a' AS col_a, '$b' AS col_b, n,\n" +
        s"  CASE WHEN $dx > 0 AND $dy > 0 THEN\n" +
        s"    (CAST(n AS DOUBLE) * sp_${a}_$b - s_$a * s_$b) / (sqrt($dx) * sqrt($dy))\n" +
        s"  END AS corr FROM a"
    }
    s"""WITH a AS (SELECT COUNT(*) AS n,
       |  ${sums.mkString(",\n  ")}
       |FROM lineitem)
       |SELECT col_a, col_b, n, corr FROM (
       |${rows.mkString("\nUNION ALL ")})
       |ORDER BY col_a, col_b""".stripMargin
  }

  // ---- profile_histogram: equi-width value distributions ----------------
  // The Deequ/column-profiler histogram: 10 equal-width bins per numeric
  // column between its observed min and max. Two scans by necessity
  // (global min/max, then bucketing) — both full hash aggregations over
  // a LONG (cname, v) unpivot, so one plan covers every column and the
  // Spark exprs and the oracle SQL render from the SAME column list (the
  // profile_correlations rule — a column added in one place only cannot
  // drift). Bin arithmetic is pure IEEE on identical doubles
  // ((v−min)/(max−min)·10, floor, clamp) — bit-identical cross-engine;
  // a constant column (max = min) collapses into bin 0 instead of
  // dividing by zero.
  private val histCols =
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  private def profileHist(s: SparkSession, d: String): DataFrame = {
    val stackArgs = histCols.map(c => s"'$c', $c").mkString(", ")
    val long = T.lineitem(s, d)
      .select(expr(s"stack(${histCols.size}, $stackArgs) AS (cname, v)"))
      .where(col("v").isNotNull)
    val st = long.groupBy(col("cname"))
      .agg(min(col("v")).as("cmin"), max(col("v")).as("cmax"))
    long.join(broadcast(st), Seq("cname"))
      .withColumn("bin",
        when(col("cmax") === col("cmin"), lit(0L))
          .otherwise(least(lit(9L),
            floor((col("v") - col("cmin")) / (col("cmax") - col("cmin")) * 10))))
      .groupBy(col("cname"), col("bin"), col("cmin"), col("cmax"))
      .agg(count(lit(1)).as("n_rows"))
      .select(col("cname"), col("bin"), col("cmin"), col("cmax"), col("n_rows"))
      .orderBy(col("cname"), col("bin"))
  }

  private val profileHistSql = {
    val unions = histCols.map(c =>
      s"SELECT '$c' AS cname, $c AS v FROM lineitem")
      .mkString("\n  UNION ALL ")
    s"""WITH lng AS (
       |  SELECT cname, v FROM (
       |  $unions) WHERE v IS NOT NULL),
       |st AS (SELECT cname, MIN(v) AS cmin, MAX(v) AS cmax
       |       FROM lng GROUP BY cname)
       |SELECT cname, bin, cmin, cmax, COUNT(*) AS n_rows FROM (
       |  SELECT l.cname,
       |    CASE WHEN st.cmax = st.cmin THEN 0
       |         ELSE CAST(least(9, floor((l.v - st.cmin)
       |           / (st.cmax - st.cmin) * 10)) AS BIGINT) END AS bin,
       |    st.cmin, st.cmax
       |  FROM lng l JOIN st USING (cname))
       |GROUP BY cname, bin, cmin, cmax ORDER BY cname, bin""".stripMargin
  }

  // ---- profile_integrity: referential-integrity profiling ---------------
  // The Deequ-style foreign-key audit a pipeline runs before it trusts a
  // join: per declared (child.key → parent.key) relationship, the child
  // row/key counts, the ORPHAN count (child rows whose key has no
  // parent — each is a row an inner join silently drops), parent-key
  // coverage (parents with ≥1 child), and the two derived fractions.
  // One declared list renders BOTH the Spark aggregations and the oracle
  // SQL (the profile_correlations rule). Includes the engine's own
  // embeddings.vec_id → documents.doc_id contract — the assumption the
  // hybrid-retrieval fusion joins on, here made measurable.
  //
  // Scale shape: per relationship one left-anti + one left-semi join on
  // the key (the orphan/coverage probes — the parent side is a distinct
  // key set, broadcast when it fits) and two hash aggregations; the
  // per-relationship 1-row results cross-join into one output row. Null
  // child keys count as orphans in both engines (anti-join keeps them;
  // NOT EXISTS never matches them).
  private val fkRels = Seq(
    ("emb_vec_to_doc", "embeddings", "vec_id", "documents", "doc_id"),
    ("lineitem_to_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders_to_customer", "orders", "o_custkey", "customer", "c_custkey"))

  private def tableOf(s: SparkSession, d: String, name: String): DataFrame =
    name match {
      case "embeddings" => T.embeddings(s, d)
      case "documents"  => T.documents(s, d)
      case "lineitem"   => T.lineitem(s, d)
      case "orders"     => T.orders(s, d)
      case "customer"   => T.customer(s, d)
    }

  // r15: all five counts per relationship derive from ONE key-level
  // relation — child keys pre-aggregated to (k, cc), full-outer-joined
  // with the distinct parent keys (both sides hash-partitioned on k, so
  // the join adds no exchange), then a single 1-row aggregate. This
  // replaces the four separate probes (count+countDistinct expand,
  // anti join, semi join) that re-shuffled the child table three
  // times — the sweep's #3 absolute at sf1. Null-key semantics are
  // unchanged: equi-joins never match nulls, so a null child-key group
  // lands parent-less (orphans, like the anti join kept it), a null
  // parent key lands child-less (counted in n_parent_keys, never
  // covered), and countDistinct's null-exclusion is the k-not-null
  // guard on n_child_keys.
  private def profileIntegrity(s: SparkSession, d: String): DataFrame =
    fkRels.map { case (name, childT, ck, parentT, pk) =>
      val cks = tableOf(s, d, childT).select(col(ck).as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("cc"))
      val pks = tableOf(s, d, parentT).select(col(pk).as("k")).distinct()
        .withColumn("isp", lit(1))
      cks.join(pks, Seq("k"), "full_outer")
        .agg(
          coalesce(sum(col("cc")), lit(0L)).as("n_child"),
          count(when(col("cc").isNotNull && col("k").isNotNull, 1))
            .as("n_child_keys"),
          coalesce(sum(when(col("isp").isNull, col("cc"))), lit(0L))
            .as("n_orphans"),
          count(col("isp")).as("n_parent_keys"),
          count(when(col("cc").isNotNull && col("isp").isNotNull, 1))
            .as("n_covered_parents"))
        .select(lit(name).as("rel"), col("n_child"), col("n_child_keys"),
          col("n_orphans"), col("n_parent_keys"), col("n_covered_parents"),
          (col("n_orphans").cast(DoubleType) /
            col("n_child").cast(DoubleType)).as("orphan_frac"),
          (col("n_covered_parents").cast(DoubleType) /
            col("n_parent_keys").cast(DoubleType)).as("coverage"))
    }.reduce(_ unionByName _).orderBy(col("rel"))

  private val profileIntegritySql = {
    val rows = fkRels.map { case (name, childT, ck, parentT, pk) =>
      s"""SELECT '$name' AS rel,
         |  (SELECT COUNT(*) FROM $childT) AS n_child,
         |  (SELECT COUNT(DISTINCT $ck) FROM $childT) AS n_child_keys,
         |  (SELECT COUNT(*) FROM $childT c WHERE NOT EXISTS
         |    (SELECT 1 FROM $parentT p WHERE p.$pk = c.$ck)) AS n_orphans,
         |  (SELECT COUNT(DISTINCT $pk) FROM $parentT) AS n_parent_keys,
         |  (SELECT COUNT(DISTINCT p.$pk) FROM $parentT p
         |    JOIN $childT c ON c.$ck = p.$pk) AS n_covered_parents,
         |  CAST((SELECT COUNT(*) FROM $childT c WHERE NOT EXISTS
         |    (SELECT 1 FROM $parentT p WHERE p.$pk = c.$ck)) AS DOUBLE)
         |    / CAST((SELECT COUNT(*) FROM $childT) AS DOUBLE) AS orphan_frac,
         |  CAST((SELECT COUNT(DISTINCT p.$pk) FROM $parentT p
         |    JOIN $childT c ON c.$ck = p.$pk) AS DOUBLE)
         |    / CAST((SELECT COUNT(DISTINCT $pk) FROM $parentT) AS DOUBLE)
         |    AS coverage""".stripMargin
    }
    rows.mkString("", "\nUNION ALL\n", "\nORDER BY rel")
  }

  // ---- profile_drift: PSI distribution drift between time halves --------
  // The production data-quality monitor: split the event stream at its
  // time midpoint and compare the event_type distribution of the two
  // halves with the Population Stability Index — PSI_i = (p_b − p_a) ·
  // ln(p_b / p_a), the standard drift metric (|PSI| ≥ 0.2 is the
  // conventional "investigate" threshold). Counts are add-one smoothed so
  // a category absent from one half yields a large finite term, not ±∞.
  //
  // Scale shape: one scan → a per-type conditional agg (map-side partial;
  // cardinality = #event types, tiny), with the midpoint and the totals
  // each a 1-row broadcast. Nothing here grows with volume except the
  // single pass over the data — the shape a 100 TB daily drift check
  // needs.
  //
  // Determinism: the midpoint is exact integer-µs arithmetic; each p is
  // one IEEE divide; ln() is rounded through DECIMAL(18,6) at the point
  // of use (the text_tfidf rule) so the libm tail can't flip a
  // comparison; the psi term is then two IEEE multiplies of identical
  // expression trees in both engines.
  private def profileDrift(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val ev = T.events(s, d)
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
    val mid = ev.agg(expr("(min(us) + max(us)) div 2").as("mid"))
    val halves = ev.crossJoin(broadcast(mid))
      .groupBy(col("event_type"))
      .agg(sum(when(col("us") < col("mid"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("us") >= col("mid"), 1L).otherwise(0L)).as("n_b"))
    val totals = halves.agg(sum(col("n_a")).as("t_a"),
      sum(col("n_b")).as("t_b"), count(lit(1)).as("k"))
    halves.crossJoin(broadcast(totals))
      .withColumn("p_a",
        (col("n_a") + 1).cast(DoubleType) / (col("t_a") + col("k")).cast(DoubleType))
      .withColumn("p_b",
        (col("n_b") + 1).cast(DoubleType) / (col("t_b") + col("k")).cast(DoubleType))
      .withColumn("psi_term", (col("p_b") - col("p_a")) *
        log(col("p_b") / col("p_a")).cast(DecimalType(18, 6)).cast(DoubleType))
      .select(col("event_type"), col("n_a"), col("n_b"),
        col("p_a"), col("p_b"), col("psi_term"))
      .orderBy(col("event_type"))
  }

  private val profileDriftSql =
    """WITH ev AS (SELECT event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
      |mid AS (SELECT (MIN(us) + MAX(us)) // 2 AS mid FROM ev),
      |h AS (SELECT event_type,
      |    CAST(SUM(CASE WHEN us < mid THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(SUM(CASE WHEN us >= mid THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      |  FROM ev CROSS JOIN mid GROUP BY event_type),
      |tot AS (SELECT SUM(n_a) AS t_a, SUM(n_b) AS t_b, COUNT(*) AS k FROM h)
      |SELECT event_type, n_a, n_b,
      |  CAST(n_a + 1 AS DOUBLE) / CAST(t_a + k AS DOUBLE) AS p_a,
      |  CAST(n_b + 1 AS DOUBLE) / CAST(t_b + k AS DOUBLE) AS p_b,
      |  (CAST(n_b + 1 AS DOUBLE) / CAST(t_b + k AS DOUBLE)
      |   - CAST(n_a + 1 AS DOUBLE) / CAST(t_a + k AS DOUBLE)) *
      |  CAST(CAST(ln((CAST(n_b + 1 AS DOUBLE) / CAST(t_b + k AS DOUBLE)) /
      |    (CAST(n_a + 1 AS DOUBLE) / CAST(t_a + k AS DOUBLE))) AS DECIMAL(18,6))
      |    AS DOUBLE) AS psi_term
      |FROM h CROSS JOIN tot ORDER BY event_type""".stripMargin

  // ---- profile_snapshot_diff: dataset-version reconciliation report ------
  // The ops question every pipeline rerun raises: what actually changed
  // between yesterday's snapshot and today's? Two deterministic slices of
  // the documents table stand in for the snapshots (old = doc_id % 5 ≠ 0
  // with a 40-char truncation "edit" on % 11 = 0 rows; new = doc_id % 7 ≠
  // 0, current text), and the diff classifies every id by FULL OUTER
  // fingerprint comparison: added (new only), removed (old only), changed
  // (both, fingerprints differ), unchanged — rolled up per source. The
  // one shared fingerprint definition (Tables.textFingerprint) does the
  // comparing, so a drifting fp would desync this report from the dedup
  // family loudly in the oracle.
  //
  // Scale shape: two narrow scans + ONE full-outer join on doc_id (the
  // natural co-partitioned key; both snapshot scans shuffle 8-byte ids +
  // 16-byte fps, never text) + a per-source rollup riding the join's
  // output. At 100 TB the fingerprints would be precomputed snapshot
  // manifests — this is exactly the manifest-diff shape.
  private def snapshotDiff(s: SparkSession, d: String): DataFrame = {
    val fp = graft.core.Tables.textFingerprint _
    val docs = T.documents(s, d)
    val old = docs.filter(col("doc_id") % 5 =!= 0)
      .select(col("doc_id"), col("source"),
        fp(when(col("doc_id") % 11 === 0, substring(col("text"), 1, 40))
          .otherwise(col("text"))).as("fp_old"))
    val neu = docs.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"), col("source").as("source_new"),
        fp(col("text")).as("fp_new"))
    old.join(neu, Seq("doc_id"), "full_outer")
      .select(coalesce(col("source"), col("source_new")).as("source"),
        when(col("fp_old").isNull, "added")
          .when(col("fp_new").isNull, "removed")
          .when(col("fp_old") =!= col("fp_new"), "changed")
          .otherwise("unchanged").as("verdict"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_ids"),
        sum(when(col("verdict") === "added", 1L).otherwise(0L))
          .cast("long").as("n_added"),
        sum(when(col("verdict") === "removed", 1L).otherwise(0L))
          .cast("long").as("n_removed"),
        sum(when(col("verdict") === "changed", 1L).otherwise(0L))
          .cast("long").as("n_changed"),
        sum(when(col("verdict") === "unchanged", 1L).otherwise(0L))
          .cast("long").as("n_unchanged"))
      .orderBy(col("source"))
  }

  private val snapshotDiffSql =
    """WITH old AS (
      |  SELECT doc_id, source,
      |    md5(lower(trim(regexp_replace(
      |      CASE WHEN doc_id % 11 = 0 THEN substring(text, 1, 40)
      |           ELSE text END, '\s+', ' ', 'g')))) AS fp_old
      |  FROM documents WHERE doc_id % 5 <> 0),
      |neu AS (
      |  SELECT doc_id, source AS source_new,
      |    md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp_new
      |  FROM documents WHERE doc_id % 7 <> 0),
      |diff AS (
      |  SELECT COALESCE(old.source, neu.source_new) AS source,
      |    CASE WHEN fp_old IS NULL THEN 'added'
      |         WHEN fp_new IS NULL THEN 'removed'
      |         WHEN fp_old <> fp_new THEN 'changed'
      |         ELSE 'unchanged' END AS verdict
      |  FROM old FULL OUTER JOIN neu ON old.doc_id = neu.doc_id)
      |SELECT source, COUNT(*) AS n_ids,
      |  CAST(SUM(CASE WHEN verdict = 'added' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_added,
      |  CAST(SUM(CASE WHEN verdict = 'removed' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_removed,
      |  CAST(SUM(CASE WHEN verdict = 'changed' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_changed,
      |  CAST(SUM(CASE WHEN verdict = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_unchanged
      |FROM diff GROUP BY source ORDER BY source""".stripMargin

  // ---- profile_join_skew: heavy-hitter diagnosis for a shuffle key -------
  // The pre-flight check before every big join: WHICH keys are hot, how
  // hot relative to uniform, and do the hot keys co-locate into the same
  // hash partition (the case that actually OOMs an executor — two
  // medium-hot keys sharing a reducer hurt as much as one huge key).
  // `part` simulates the shuffle's bucket assignment with the engine's
  // seeded 48-bit hash (oracle-mirrorable, unlike Spark's internal
  // Murmur3) over 32 buckets — the session's shuffle parallelism.
  //
  // Scale shape: one hash agg collapses the table to key cardinality;
  // everything after runs on the collapsed histogram (1-row totals
  // broadcast, 32-row bucket rollup broadcast, TakeOrderedAndProject for
  // the top-10 — no global sort). At 100 TB the histogram is the only
  // exchange; this is exactly the sampling-free version of what AQE's
  // skew detection reads from map output sizes, made queryable.
  private def h48p(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 12), 16, 10).cast(LongType)

  private def joinSkew(s: SparkSession, d: String): DataFrame = {
    val counts = T.events(s, d).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("part",
        h48p(col("user_id").cast(StringType)) % 32)
    val totals = counts.agg(sum(col("n_rows")).as("total"),
      count(lit(1)).as("n_keys"))
    val parts = counts.groupBy(col("part"))
      .agg(sum(col("n_rows")).as("part_rows"))
    counts.crossJoin(broadcast(totals))
      .join(broadcast(parts), Seq("part"))
      .select(col("user_id"), col("n_rows"),
        (col("n_rows").cast(DoubleType) / col("total")).as("share"),
        ((col("n_rows") * col("n_keys")).cast(DoubleType) / col("total"))
          .as("x_avg"),
        col("part"), col("part_rows"),
        (col("part_rows").cast(DoubleType) / col("total")).as("part_share"))
      .orderBy(col("n_rows").desc, col("user_id")).limit(10)
  }

  private val joinSkewSql =
    """WITH c AS (SELECT user_id, count(*) AS n_rows,
      |    CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 12)
      |      AS BIGINT) % 32 AS part
      |  FROM events GROUP BY user_id),
      |t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS total,
      |    count(*) AS n_keys FROM c),
      |p AS (SELECT part, CAST(sum(n_rows) AS BIGINT) AS part_rows
      |  FROM c GROUP BY part)
      |SELECT c.user_id, c.n_rows,
      |  CAST(c.n_rows AS DOUBLE) / t.total AS share,
      |  CAST(c.n_rows * t.n_keys AS DOUBLE) / t.total AS x_avg,
      |  c.part, p.part_rows,
      |  CAST(p.part_rows AS DOUBLE) / t.total AS part_share
      |FROM c CROSS JOIN t JOIN p USING (part)
      |ORDER BY c.n_rows DESC, c.user_id LIMIT 10""".stripMargin

  // ---- q59_compaction_plan: small-file bin-packing planner ---------------
  // The table-maintenance primitive every lakehouse runs nightly: group
  // small files into target-sized compaction bins, per table partition.
  // The manifest is simulated from events (file = 250 consecutive ids per
  // event_type partition, bytes = Σ 16 + length(props)); the plan assigns
  // each file to bin floor(start_offset / target) — the same offset-based
  // packing Spark's own FilePartition planner uses, so a bin overfills by
  // at most one file and is never fragmented.
  //
  // Scale shape: the plan runs on the MANIFEST (file-grain rows, ~1e6
  // rows per million files), not the data: one agg to file grain, one
  // prefix-sum window per partition (rides the same event_type exchange),
  // one rollup to bin grain. The 100 TB table itself is never read.
  private val compactionTarget = 8192L

  private def compactionPlan(s: SparkSession, d: String): DataFrame = {
    val files = T.events(s, d)
      .groupBy(col("event_type"), expr("event_id div 250").as("file_id"))
      .agg(sum(length(col("props")) + 16L).as("bytes"))
    files
      .withColumn("bin",
        expr(s"coalesce(sum(bytes) over (partition by event_type " +
          s"order by file_id rows between unbounded preceding and " +
          s"1 preceding), 0) div $compactionTarget"))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("bin_bytes"),
        min(col("file_id")).as("first_file"),
        max(col("file_id")).as("last_file"))
      .withColumn("fill",
        col("bin_bytes").cast(DoubleType) / lit(compactionTarget))
      .orderBy(col("event_type"), col("bin"))
  }

  private val compactionPlanSql =
    s"""WITH f AS (SELECT event_type, event_id // 250 AS file_id,
      |    CAST(sum(length(props) + 16) AS BIGINT) AS bytes
      |  FROM events GROUP BY event_type, event_id // 250),
      |b AS (SELECT event_type, file_id, bytes,
      |    CAST(coalesce(sum(bytes) OVER (PARTITION BY event_type
      |      ORDER BY file_id ROWS BETWEEN UNBOUNDED PRECEDING AND
      |      1 PRECEDING), 0) AS BIGINT) // $compactionTarget AS bin
      |  FROM f)
      |SELECT event_type, bin, count(*) AS n_files,
      |  CAST(sum(bytes) AS BIGINT) AS bin_bytes,
      |  min(file_id) AS first_file, max(file_id) AS last_file,
      |  CAST(sum(bytes) AS DOUBLE) / $compactionTarget AS fill
      |FROM b GROUP BY event_type, bin
      |ORDER BY event_type, bin""".stripMargin

  override val defs: Seq[(String, QueryDef)] = Seq(
    "profile_columns" -> QueryDef(profile, Some(profileSql)),
    "profile_fd" -> QueryDef(fdProfile, Some(fdSql)),
    "profile_join_skew" -> QueryDef(joinSkew, Some(joinSkewSql)),
    "q59_compaction_plan" -> QueryDef(compactionPlan, Some(compactionPlanSql)),
    "profile_snapshot_diff" -> QueryDef(snapshotDiff, Some(snapshotDiffSql)),
    "profile_correlations" -> QueryDef(profileCorr, Some(profileCorrSql)),
    "profile_histogram" -> QueryDef(profileHist, Some(profileHistSql)),
    "profile_integrity" -> QueryDef(profileIntegrity, Some(profileIntegritySql)),
    "profile_drift" -> QueryDef(profileDrift, Some(profileDriftSql)),
    "q52_zorder_layout" -> QueryDef(zorderLayout, Some(zorderLayoutSql)))
}
