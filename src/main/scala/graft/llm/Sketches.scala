package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{QueryDef, QueryGroup, Tables => T}

/** Sketch operators (the "novel sketch" slot of the extension inventory):
  * mergeable summaries whose per-partition pieces combine associatively —
  * the only aggregation shape that works at 100 TB when exact state would
  * not fit. Counter/register merges are order-independent, so results are
  * run-to-run deterministic.
  *
  * Oracle strategy: the sketch bytes themselves are not DuckDB-reproducible,
  * so the registry queries output the EXACT companion columns (graded
  * bit-for-bit by the oracle) plus a boolean accuracy flag computed from
  * the sketch inside the query — the oracle asserts the flag is TRUE, which
  * grades the sketch's error bound, not just row counts. Raw sketch
  * surfaces stay available to `SketchesSpec` via the *Raw builders.
  */
object Sketches extends QueryGroup {

  /** Count-min sketch of event users per event type (ε=1%, δ=5%, fixed
    * seed), plus the exact count of a fixed probe key. The sketch bytes
    * travel as a column; consumers deserialize via
    * `org.apache.spark.util.sketch.CountMinSketch.readFrom`. */
  private[llm] def cmsRaw(s: SparkSession, d: String): DataFrame =
    T.events(s, d)
      .groupBy(col("event_type"))
      .agg(expr("hex(count_min_sketch(user_id, 0.01d, 0.95d, 42))").as("cms_hex"),
        count(lit(1)).as("n_obs"),
        sum(when(col("user_id") === 7L, 1L).otherwise(0L)).as("probe_exact"))

  /** Deserialize + point-query the CMS — the consumer side of the sketch
    * column (codegen'd `functions.CmsEstimate`; runs on the aggregated
    * group-count-sized result, never on base-table rows). */
  private def cmsEstimate(hex: org.apache.spark.sql.Column,
      key: org.apache.spark.sql.Column) =
    graft.functions.CmsEstimate.cmsEstimate(hex, key)

  /** Registry surface: sketch built AND consumed in one query. `cms_ok`
    * checks the CMS guarantee on the probe key (never under-estimates;
    * over-estimates by at most εN) — the oracle asserts it TRUE and grades
    * `n_obs`/`probe_exact` exactly. */
  private def cms(s: SparkSession, d: String): DataFrame = {
    val est = cmsEstimate(col("cms_hex"), lit(7L)).cast(DoubleType)
    val exact = col("probe_exact").cast(DoubleType)
    cmsRaw(s, d)
      .select(col("event_type"), col("n_obs"), col("probe_exact"),
        (est >= exact &&
          est <= exact + col("n_obs").cast(DoubleType) * 0.01 + 1.0).as("cms_ok"))
      .orderBy(col("event_type"))
  }

  private val cmsSql =
    """SELECT event_type, COUNT(*) AS n_obs,
      |  CAST(SUM(CASE WHEN user_id = 7 THEN 1 ELSE 0 END) AS BIGINT) AS probe_exact,
      |  TRUE AS cms_ok
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** DataSketches HLL distinct words per language (register merges are
    * commutative → deterministic estimate), alongside the exact count.
    *
    * Both aggregates run over PRE-DEDUPLICATED (lang, word) pairs, not
    * the raw token stream: HLL state is duplicate-insensitive, so the
    * sketch (and its estimate) is identical either way, and the exact
    * count becomes a plain count. Aggregating them together over the raw
    * stream planned countDistinct's distinct-rewrite Expand, which
    * DOUBLED the exploded token stream before the shuffle — the 10×
    * sweep showed it as this query's linear wall growth. The dedup agg
    * map-side-combines to vocabulary size per partition, so the shuffle
    * carries |vocab × lang| rows no matter the corpus. */
  private[llm] def hllRaw(s: SparkSession, d: String): DataFrame =
    Dedup.words(T.documents(s, d))
      .select(col("lang"), col("word")).distinct()
      .groupBy(col("lang"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(word))").as("hll_words"),
        count(lit(1)).as("exact_words"))

  /** Registry surface: exact count graded by the oracle; `hll_ok` asserts
    * the estimate sits within 5% of exact. */
  private def hll(s: SparkSession, d: String): DataFrame =
    hllRaw(s, d)
      .select(col("lang"), col("exact_words"),
        (abs(col("hll_words").cast(DoubleType) - col("exact_words").cast(DoubleType)) /
          col("exact_words").cast(DoubleType) <= 0.05).as("hll_ok"))
      .orderBy(col("lang"))

  private val hllSql =
    """WITH wrd AS (
      |  SELECT doc_id, lang, word FROM (
      |    SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
      |    FROM documents) WHERE word <> '')
      |SELECT lang, COUNT(DISTINCT word) AS exact_words, TRUE AS hll_ok
      |FROM wrd GROUP BY lang ORDER BY lang""".stripMargin

  /** Greenwald-Khanna quantile sketch (approx_percentile, accuracy 100 →
    * rank error ≤ n/100) over per-language doc lengths. Graded columns are
    * the exact interpolated p50/p90 (percentile ↔ quantile_cont match
    * bitwise on doubles); `q_ok` checks the sketch's RANK guarantee
    * in-query with the tie-robust sandwich: #(< est)/n ≤ q+ε and
    * #(≤ est)/n ≥ q−ε. */
  private def quantileSketch(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d).select(col("lang"), col("n_chars"))
    val agg = docs.groupBy(col("lang")).agg(
      count(lit(1)).as("n"),
      percentile(col("n_chars"), lit(0.5)).as("exact_p50"),
      percentile(col("n_chars"), lit(0.9)).as("exact_p90"),
      percentile_approx(col("n_chars"), lit(0.5), lit(100)).as("ap50"))
    val ranks = docs.join(agg.select(col("lang"), col("ap50")), Seq("lang"))
      .groupBy(col("lang")).agg(
        sum(when(col("n_chars") < col("ap50"), 1L).otherwise(0L)).as("n_lt"),
        sum(when(col("n_chars") <= col("ap50"), 1L).otherwise(0L)).as("n_le"))
    val eps = lit(0.02) + lit(1.0) / col("n").cast(DoubleType)
    agg.join(ranks, Seq("lang"))
      .select(col("lang"), col("n"), col("exact_p50"), col("exact_p90"),
        (col("n_lt").cast(DoubleType) / col("n") <= lit(0.5) + eps &&
          col("n_le").cast(DoubleType) / col("n") >= lit(0.5) - eps).as("q_ok"))
      .orderBy(col("lang"))
  }

  private val quantileSketchSql =
    """SELECT lang, COUNT(*) AS n,
      |  quantile_cont(n_chars, 0.5) AS exact_p50,
      |  quantile_cont(n_chars, 0.9) AS exact_p90,
      |  TRUE AS q_ok
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** Bloom-filter membership — the runtime-filter shape: build a bloom
    * over the dim-side keys (BUILDING customers), probe the fact side
    * (events) WITHOUT joining it, so at 100 TB the filter prunes the probe
    * scan before any shuffle. Graded columns are the exact membership
    * counts; the flags check the bloom's two guarantees in-query (zero
    * false negatives; false-positive rate under the sizing bound). */
  private def bloom(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s) // sessions built w/o extensions
    val members = T.customer(s, d).where(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("user_id"))
    members.createOrReplaceTempView("g_sketch_bloom_members")
    T.events(s, d).select(col("user_id"))
      .createOrReplaceTempView("g_sketch_bloom_events")
    // bloom_filter_agg needs FOLDABLE sizing, so size it from the actual
    // dim-side count (one tiny dim-side action, like the IVF centroid
    // collect) — fixed constants would blow the FPR bound the flag checks
    // as soon as the scale factor grows. 16 bits/item ≈ 4e-4 FPR at any n.
    val nMembers = math.max(members.count(), 1L)
    // Spark rejects numBits above the session's bloom-filter ceiling
    // (spark.sql.optimizer.runtime.bloomFilter.maxNumBits, default 64M) —
    // clamp so the query still runs past ~4.2M members; past the clamp the
    // bound degrades gracefully and the in-query fpr_ok flag absorbs it.
    val maxNumBits = s.conf
      .getOption("spark.sql.optimizer.runtime.bloomFilter.maxNumBits")
      .map(_.toLong).getOrElse(67108864L)
    val numBits = math.min(nMembers * 16, maxNumBits)
    // might_contain requires the bloom as a scalar subquery — built once,
    // broadcast as a literal, probed per fact row with no join of the
    // fact side against the dim side.
    s.sql(
      s"""SELECT COUNT(*) AS n_events,
        |  CAST(SUM(is_m) AS BIGINT) AS n_member_events,
        |  SUM(CASE WHEN is_m = 1 AND NOT bh THEN 1 ELSE 0 END) = 0
        |    AS bloom_no_false_neg,
        |  CAST(SUM(CASE WHEN is_m = 0 AND bh THEN 1 ELSE 0 END) AS DOUBLE) /
        |    CAST(GREATEST(SUM(CASE WHEN is_m = 0 THEN 1 ELSE 0 END), 1)
        |      AS DOUBLE) <= 0.05 AS bloom_fpr_ok
        |FROM (
        |  SELECT e.user_id,
        |    CASE WHEN m.user_id IS NOT NULL THEN 1 ELSE 0 END AS is_m,
        |    might_contain(
        |      (SELECT bloom_filter_agg(user_id, ${nMembers}L, ${numBits}L)
        |       FROM g_sketch_bloom_members), e.user_id) AS bh
        |  FROM g_sketch_bloom_events e
        |  LEFT JOIN g_sketch_bloom_members m ON e.user_id = m.user_id)"""
        .stripMargin)
  }

  private val bloomSql =
    """SELECT COUNT(*) AS n_events,
      |  CAST(SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_member_events,
      |  TRUE AS bloom_no_false_neg, TRUE AS bloom_fpr_ok
      |FROM events e LEFT JOIN
      |  (SELECT c_custkey AS user_id FROM customer
      |   WHERE c_mktsegment = 'BUILDING') c USING (user_id)""".stripMargin

  // ---- sketch_topk: space-saving heavy hitters over the word stream -----
  // The custom TypedImperativeAggregate (graft.functions.TopKFreqAgg):
  // fixed-memory partial-aggregable top-k — one shuffle of capacity-sized
  // states instead of grouping the whole key space. Capacity (256) far
  // exceeds the corpus vocabulary, so estimates are exact with zero error
  // and the oracle is the plain exact top-10; the eviction/approximation
  // path is exercised with crafted skew in TopKFreqSpec.
  private def topkWords(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TopKFreqAgg.topkFreq
    T.documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .agg(topkFreq(col("w"), 10, 256).as("tk"))
      // exactness precondition, asserted LOUDLY: the oracle is the plain
      // exact top-10, which is only what the sketch returns while nothing
      // was evicted (err = 0 everywhere). If a fixture/scale change ever
      // grows the vocabulary past capacity, fail with this message
      // instead of an inscrutable oracle hash mismatch.
      .where(assert_true(forall(col("tk"), e => e.getField("err") === 0),
        lit("sketch_topk: vocabulary exceeded sketch capacity 256 — " +
          "estimates are now approximate and the exact-count oracle " +
          "no longer applies")).isNull)
      .select(explode(col("tk")).as("e"))
      .select(col("e.value").as("word"), col("e.est").as("cnt"),
        col("e.err").as("err"))
      .orderBy(col("cnt").desc, col("word"))
  }

  private val topkWordsSql =
    """SELECT word, cnt, CAST(0 AS BIGINT) AS err FROM (
      |  SELECT u AS word, COUNT(*) AS cnt FROM (
      |    SELECT unnest(string_split(text, ' ')) AS u FROM documents)
      |  WHERE u <> '' GROUP BY u)
      |ORDER BY cnt DESC, word LIMIT 10""".stripMargin

  // ---- sketch_hll_rollup: mergeable sketches under grouping sets --------
  // The property that makes sketches matter at 100 TB: HLL partials MERGE,
  // so one pass computes distinct counts for (lang, source), (lang), and
  // the grand total — Spark rolls the same partial sketches up through
  // every grouping set instead of rescanning per level. Exact companion
  // graded by the oracle; the in-query flag asserts the HLL++ estimate
  // within 10% at every rollup level. Sort order pins NULLS FIRST on both
  // sides (the engines' ASC defaults disagree).
  // The rollup, too, aggregates PRE-DEDUPLICATED (lang, source, wh)
  // triples (the finest grouping grain): dedup at the fine grain
  // preserves every coarser level's distinct set, countDistinct stays
  // necessary at the rolled-up levels (a word can recur across sources)
  // but HLL++ partials are duplicate-insensitive — so the rollup Expand
  // and the distinct-rewrite Expand multiply a vocabulary-sized input,
  // not the raw token stream (the same sweep finding as sketch_hll).
  private def hllRollup(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .select(col("lang"), col("source"),
        explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .select(col("lang"), col("source"),
        Dedup.h48(col("w")).as("wh"))
      .distinct()
      .rollup(col("lang"), col("source"))
      .agg(countDistinct(col("wh")).as("exact_words"),
        approx_count_distinct(col("wh"), 0.02).as("approx"))
      .select(col("lang"), col("source"), col("exact_words"),
        (abs(col("approx").cast(DoubleType) - col("exact_words").cast(DoubleType)) /
          col("exact_words").cast(DoubleType) <= 0.10).as("acd_ok"))
      .orderBy(col("lang").asc_nulls_first, col("source").asc_nulls_first)

  private val hllRollupSql =
    """WITH wrd AS (
      |  SELECT lang, source,
      |    CAST('0x'||substring(md5(u),1,12) AS BIGINT) AS wh
      |  FROM (SELECT lang, source, unnest(string_split(text, ' ')) AS u
      |        FROM documents) WHERE u <> '')
      |SELECT lang, source, COUNT(DISTINCT wh) AS exact_words, TRUE AS acd_ok
      |FROM wrd GROUP BY ROLLUP (lang, source)
      |ORDER BY lang NULLS FIRST, source NULLS FIRST""".stripMargin

  // ---- KMV (k-minimum-values / theta-style) distinct sketch -------------
  // The sketch family's SET-OPERATION member: per event type, keep the k
  // smallest 48-bit hashes of the distinct user set; any two sketches
  // then merge (union the two k-sets, re-take the k smallest) into
  // estimates of |A∪B| (the classic (k−1)·H/h_(k) estimator, exact when
  // the merged set has fewer than k members) and |A∩B| (the Jaccard
  // fraction of the merged k-set present in BOTH input sketches, times
  // the union estimate) — the intersection-across-segments question HLL
  // cannot answer without inclusion-exclusion error stacking.
  //
  // Scale shape: building the sketches is one distinct + one bounded
  // per-key top-k (WindowGroupLimit) over the corpus; everything after
  // operates on ≤ k rows per (pair) — constant-size, broadcast-friendly.
  // Everything is integer/hash arithmetic until the two final pinned
  // IEEE divisions, so the ESTIMATES are graded bit-for-bit by the
  // oracle, not just the exact companions; the error-bound flags
  // (±50% union at ~4σ for k=64, ±35%·|A∪B| intersection at ~5.6σ)
  // are additionally asserted TRUE in SketchesSpec.
  private val kmvK = 64
  private val kmvPow = 281474976710656L // 2^48: the h48 hash space

  private def kmvSetops(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = T.events(s, d).select(col("event_type"), col("user_id")).distinct()
    val h = u.select(col("event_type"),
      Dedup.h48(col("user_id").cast(StringType)).as("h"))
    val wk = Window.partitionBy(col("event_type")).orderBy(col("h"))
    val kmv = h.withColumn("rn", row_number().over(wk))
      .filter(col("rn") <= kmvK).select(col("event_type"), col("h"))
    val ty = u.select(col("event_type")).distinct()
    val pr = ty.select(col("event_type").as("ta"))
      .crossJoin(ty.select(col("event_type").as("tb")))
      .filter(col("ta") < col("tb"))
    val mg = pr.join(kmv.withColumnRenamed("event_type", "ta"), Seq("ta"))
      .select(col("ta"), col("tb"), col("h"))
      .unionByName(pr.join(kmv.withColumnRenamed("event_type", "tb"), Seq("tb"))
        .select(col("ta"), col("tb"), col("h")))
      .distinct()
    val inA = kmv.select(col("event_type").as("ta"), col("h"), lit(1).as("ina"))
    val inB = kmv.select(col("event_type").as("tb"), col("h"), lit(1).as("inb"))
    val wm = Window.partitionBy(col("ta"), col("tb")).orderBy(col("h"))
    val ag = mg.join(inA, Seq("ta", "h"), "left").join(inB, Seq("tb", "h"), "left")
      .withColumn("rn", row_number().over(wm))
      .filter(col("rn") <= kmvK)
      .groupBy(col("ta"), col("tb"))
      .agg(count(lit(1)).as("m_sz"), max(col("h")).as("kth"),
        sum(when(col("ina") === 1 && col("inb") === 1, 1L).otherwise(0L))
          .as("n_both"))
    val exu = pr.join(u.withColumnRenamed("event_type", "ta"), Seq("ta"))
      .select(col("ta"), col("tb"), col("user_id"))
      .unionByName(pr.join(u.withColumnRenamed("event_type", "tb"), Seq("tb"))
        .select(col("ta"), col("tb"), col("user_id")))
      .groupBy(col("ta"), col("tb"))
      .agg(countDistinct(col("user_id")).as("exact_union"))
    val exi = pr
      .join(u.select(col("event_type").as("ta"), col("user_id")), Seq("ta"))
      .join(u.select(col("event_type").as("tb"), col("user_id")), Seq("tb", "user_id"))
      .groupBy(col("ta"), col("tb")).agg(count(lit(1)).as("exact_inter"))
    ag.join(exu, Seq("ta", "tb"))
      .join(exi, Seq("ta", "tb"), "left")
      .withColumn("exact_inter", coalesce(col("exact_inter"), lit(0L)))
      .withColumn("est_union",
        when(col("m_sz") < kmvK, col("m_sz").cast(DoubleType))
          .otherwise((lit((kmvK - 1).toLong) * lit(kmvPow)).cast(DoubleType) /
            col("kth").cast(DoubleType))
          .cast(DecimalType(18, 4)).cast(DoubleType))
      .withColumn("est_inter",
        ((col("n_both").cast(DoubleType) / col("m_sz").cast(DoubleType)) *
          col("est_union")).cast(DecimalType(18, 4)).cast(DoubleType))
      .withColumn("union_ok",
        abs(col("est_union") - col("exact_union").cast(DoubleType)) <=
          lit(0.5) * col("exact_union").cast(DoubleType))
      .withColumn("inter_ok",
        abs(col("est_inter") - col("exact_inter").cast(DoubleType)) <=
          lit(0.35) * col("exact_union").cast(DoubleType))
      .select(col("ta"), col("tb"), col("exact_union"), col("exact_inter"),
        col("est_union"), col("est_inter"), col("union_ok"), col("inter_ok"))
      .orderBy(col("ta"), col("tb"))
  }

  private val kmvSetopsSql =
    s"""WITH u AS (SELECT DISTINCT event_type, user_id FROM events),
      |h AS (SELECT event_type,
      |    CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 12)
      |      AS BIGINT) AS h
      |  FROM u),
      |kmv AS (SELECT event_type, h FROM (
      |    SELECT event_type, h,
      |      ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
      |    FROM h) WHERE rn <= $kmvK),
      |ty AS (SELECT DISTINCT event_type FROM u),
      |pr AS (SELECT a.event_type AS ta, b.event_type AS tb
      |       FROM ty a JOIN ty b ON a.event_type < b.event_type),
      |mg AS (SELECT DISTINCT ta, tb, h FROM (
      |    SELECT pr.ta, pr.tb, k.h FROM pr JOIN kmv k ON k.event_type = pr.ta
      |    UNION ALL
      |    SELECT pr.ta, pr.tb, k.h FROM pr JOIN kmv k ON k.event_type = pr.tb)),
      |mk AS (SELECT m.ta, m.tb, m.h,
      |    CASE WHEN ka.h IS NOT NULL THEN 1 ELSE 0 END AS ina,
      |    CASE WHEN kb.h IS NOT NULL THEN 1 ELSE 0 END AS inb,
      |    ROW_NUMBER() OVER (PARTITION BY m.ta, m.tb ORDER BY m.h) AS rn
      |  FROM mg m
      |  LEFT JOIN kmv ka ON ka.event_type = m.ta AND ka.h = m.h
      |  LEFT JOIN kmv kb ON kb.event_type = m.tb AND kb.h = m.h),
      |ag AS (SELECT ta, tb, COUNT(*) AS m_sz, MAX(h) AS kth,
      |    SUM(CASE WHEN ina = 1 AND inb = 1 THEN 1 ELSE 0 END) AS n_both
      |  FROM mk WHERE rn <= $kmvK GROUP BY ta, tb),
      |exu AS (SELECT ta, tb, COUNT(DISTINCT user_id) AS exact_union FROM (
      |    SELECT pr.ta, pr.tb, u.user_id FROM pr JOIN u ON u.event_type = pr.ta
      |    UNION ALL
      |    SELECT pr.ta, pr.tb, u.user_id FROM pr JOIN u ON u.event_type = pr.tb)
      |  GROUP BY ta, tb),
      |exi AS (SELECT pr.ta, pr.tb, COUNT(*) AS exact_inter
      |  FROM pr JOIN u a ON a.event_type = pr.ta
      |  JOIN u b ON b.event_type = pr.tb AND b.user_id = a.user_id
      |  GROUP BY pr.ta, pr.tb)
      |SELECT ta, tb, exact_union, exact_inter, est_union,
      |  CAST(CAST((CAST(n_both AS DOUBLE) / CAST(m_sz AS DOUBLE)) * est_union
      |    AS DECIMAL(18,4)) AS DOUBLE) AS est_inter,
      |  abs(est_union - CAST(exact_union AS DOUBLE))
      |    <= 0.5 * CAST(exact_union AS DOUBLE) AS union_ok,
      |  abs(CAST(CAST((CAST(n_both AS DOUBLE) / CAST(m_sz AS DOUBLE)) * est_union
      |      AS DECIMAL(18,4)) AS DOUBLE) - CAST(exact_inter AS DOUBLE))
      |    <= 0.35 * CAST(exact_union AS DOUBLE) AS inter_ok
      |FROM (
      |  SELECT ag.ta, ag.tb, exu.exact_union,
      |    COALESCE(exi.exact_inter, 0) AS exact_inter, ag.m_sz, ag.n_both,
      |    CAST(CAST(CASE WHEN ag.m_sz < $kmvK THEN CAST(ag.m_sz AS DOUBLE)
      |      ELSE CAST(${(kmvK - 1).toLong * kmvPow} AS DOUBLE)
      |        / CAST(ag.kth AS DOUBLE) END
      |      AS DECIMAL(18,4)) AS DOUBLE) AS est_union
      |  FROM ag JOIN exu ON ag.ta = exu.ta AND ag.tb = exu.tb
      |  LEFT JOIN exi ON ag.ta = exi.ta AND ag.tb = exi.tb)
      |ORDER BY ta, tb""".stripMargin

  override val defs: Seq[(String, QueryDef)] = Seq(
    "sketch_kmv_setops" -> QueryDef(kmvSetops, Some(kmvSetopsSql)),
    "sketch_cms" -> QueryDef(cms, Some(cmsSql)),
    "sketch_hll" -> QueryDef(hll, Some(hllSql)),
    "sketch_quantile" -> QueryDef(quantileSketch, Some(quantileSketchSql)),
    "sketch_bloom" -> QueryDef(bloom, Some(bloomSql)),
    "sketch_topk" -> QueryDef(topkWords, Some(topkWordsSql)),
    "sketch_hll_rollup" -> QueryDef(hllRollup, Some(hllRollupSql)),
  )
}
